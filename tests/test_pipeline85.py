"""Unit tests for batch-85: capstone compositions."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_v3_balanced_languages(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline85 import (
        q_llm_corpus_pipeline_v3,
    )

    rows = q_llm_corpus_pipeline_v3(spark, SF).collect()
    assert rows
    counts = [r.n_docs for r in rows]
    # class balancing: every surviving language keeps the same count
    assert len(set(counts)) == 1
    assert all(r.n_tokens >= 5 * r.n_docs for r in rows)  # gate: >= 5 words


def test_search_e2e_top10_contains_terms(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline85 import (
        q_search_pipeline_e2e,
    )

    rows = q_search_pipeline_e2e(spark, SF).collect()
    assert 0 < len(rows) <= 10
    ids = [r.id for r in rows]
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id").isin(ids))
        .collect()
    )
    for d in docs:
        toks = set(d.text.split())
        assert "spark" in toks and "join" in toks  # boolean gate held
    scores = [r.score6 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_funnel_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline85 import (
        q_dedup_funnel_report,
    )

    out = {r.stage: r.n for r in q_dedup_funnel_report(spark, SF).collect()}
    assert out["raw"] >= out["exact_dedup"] >= out["quality_gate"]
    assert out["quality_gate"] > 0
