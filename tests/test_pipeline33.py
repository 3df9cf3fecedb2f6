"""Unit tests for batch-33: streaming corpus curation."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_stream_curation_semantics(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline33 import (
        _MIN_TOKENS,
        q_stream_corpus_curation,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist_fps = {
        r.fingerprint
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("fingerprint"))
        .collect()
    }
    rows = q_stream_corpus_curation(spark, SF).collect()
    assert rows
    seen_fps = set()
    for r in rows:
        assert r.doc_id % 2 == 1  # only stream-side docs accepted
        assert r.fingerprint not in hist_fps  # never a historical dup
        assert r.fingerprint not in seen_fps  # one keeper per content
        seen_fps.add(r.fingerprint)
        assert r.n_tokens >= _MIN_TOKENS
    # keeper is the SMALLEST odd doc_id for its fingerprint
    odd = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("fingerprint")
    )
    first = {
        r.fingerprint: r.m
        for r in odd.groupBy("fingerprint").agg(F.min("doc_id").alias("m")).collect()
    }
    for r in rows:
        assert r.doc_id == first[r.fingerprint]
