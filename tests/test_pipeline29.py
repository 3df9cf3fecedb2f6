"""Unit tests for batch-29: Python UDTF chunker, mapInArrow stats,
Observation-API metrics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_udtf_chunks_overlap_and_reassembly(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline29 import (
        _STRIDE,
        _WIN,
        q_udtf_doc_chunks,
    )

    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in q_udtf_doc_chunks(spark, SF).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        assert len(chunks) == (len(toks) - 1) // _STRIDE + 1
        for r in chunks:
            expect = toks[r.start_tok : r.start_tok + _WIN]
            assert r.chunk.split() == expect and r.n_tokens == len(expect)
        # consecutive chunks share exactly WIN - STRIDE tokens (except a
        # short final chunk)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == _STRIDE


def test_arrow_doc_stats_matches_python(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline29 import q_arrow_doc_stats

    raw = {r.doc_id: r.text for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    rows = {r.doc_id: r for r in q_arrow_doc_stats(spark, SF).collect()}
    assert set(rows) == set(raw)
    for doc_id, text in raw.items():
        r = rows[doc_id]
        assert r.n_chars == len(text)
        assert r.n_tokens == len(text.split(" "))
        assert r.first_token == text.split(" ")[0]
        assert r.has_digit == any(c.isdigit() for c in text)


def test_observed_metrics_single_pass_values(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline29 import q_observed_metrics

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expect = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")).alias("cents"),
        F.min("l_shipdate").cast("string").alias("lo"),
        F.max("l_shipdate").cast("string").alias("hi"),
    ).collect()[0]
    got = q_observed_metrics(spark, SF).collect()[0]
    assert got.n_rows == expect.n
    assert got.total_cents == expect.cents
    assert got.min_shipdate == expect.lo and got.max_shipdate == expect.hi
