"""Unit tests for batch-23: skew report math, sentence segmentation,
applyInPandas median contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_key_skew_shares_sum_below_million(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline23 import q_key_skew_report

    out = q_key_skew_report(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 10
    assert sum(r.share_ppm for r in out) <= 1_000_000
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)


def test_sentence_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c. d e! f?"), (2, "only one sentence")],
        "doc_id long, text string",
    )
    sents = df.select("doc_id", F.explode(F.split("text", r"[.!?]+")).alias("raw")) \
        .select("doc_id", F.trim("raw").alias("sent")).filter(F.col("sent") != "")
    t = F.col("sent")
    n_words = (F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1)
    got = {r.doc_id: (r.ns, r.nw) for r in
           sents.select("doc_id", n_words.alias("w")).groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("ns"), F.sum("w").alias("nw")).collect()}
    assert got == {1: (3, 6), 2: (1, 3)}


def test_pandas_median_matches_sql(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline23 import q_pandas_group_median

    got = {r.event_type: r.median_cents
           for r in q_pandas_group_median(spark, "/root/testdata/sf0.001").collect()}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    expect = {
        r.event_type: r.m
        for r in ev.select("event_type",
                           F.round(F.col("value") * 100, 0).cast("long").alias("v"))
        .groupBy("event_type").agg(F.round(F.median("v"), 6).alias("m")).collect()
    }
    assert got == expect


def test_llm_pipeline_stages_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_curation import q_llm_corpus_pipeline

    out = q_llm_corpus_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r.quality >= 0.5
        assert 0 <= r.bin_offset < 512
        assert r.shard == r.id % 8
    # packing is per-shard contiguous: offsets within a (shard, bin)
    # never overlap
    from collections import defaultdict

    spans = defaultdict(list)
    for r in out:
        spans[(r.shard, r.bin)].append((r.bin_offset, r.n_tokens))
    for lst in spans.values():
        lst.sort()
        for (o1, n1), (o2, _) in zip(lst, lst[1:]):
            assert o1 + n1 <= o2 + 512  # concat-then-chunk may straddle bins


def test_python_datasource_writer_roundtrip(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline23 import (
        q_python_datasource_write,
    )

    out = {(r.n_regionkey, r.n) for r in
           q_python_datasource_write(spark, "/root/testdata/sf0.001").collect()}
    assert len(out) == 5 and sum(n for _, n in out) == 25


def test_json_corrupt_audit_counts(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline23 import q_json_corrupt_audit

    r = q_json_corrupt_audit(spark, "/root/testdata/sf0.001").first()
    assert r.n_corrupt == 5 and r.n_valid == 20  # every 5th of 25 nations
