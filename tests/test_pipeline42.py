"""Unit tests for batch-42: the v2 flagship composite."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_v2_pipeline_stage_invariants(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline42 import (
        _MAX_EPOCHS,
        _SHARDS,
        q_llm_corpus_pipeline_v2,
    )

    rows = q_llm_corpus_pipeline_v2(spark, SF).collect()
    assert rows
    n_docs_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    uniq_docs = {r.doc_id for r in rows}
    # the pipeline filters (tail bucket + val/test split dropped), so
    # the surviving doc set is a strict subset
    assert 0 < len(uniq_docs) < n_docs_total
    per_doc_epochs: dict[int, set] = {}
    for r in rows:
        assert r.bucket in ("head", "middle")  # tail dropped
        assert 1 <= r.epoch <= _MAX_EPOCHS
        assert 0 <= r.shard < _SHARDS
        per_doc_epochs.setdefault(r.doc_id, set()).add(r.epoch)
    # epochs are dense per doc (1..repeats)
    for eps in per_doc_epochs.values():
        assert eps == set(range(1, len(eps) + 1))
    # positions dense per (epoch, shard)
    per_shard: dict[tuple, list] = {}
    for r in rows:
        per_shard.setdefault((r.epoch, r.shard), []).append(r.pos)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # repetition targets balance: expanded per-source spread no worse
    # than the pre-expansion spread
    before = Counter(r.source for r in rows if r.epoch == 1)
    after = Counter(r.source for r in rows)
    assert max(after.values()) / min(after.values()) <= max(
        before.values()
    ) / min(before.values()) + 1e-9


def test_v2_no_duplicate_content_across_output(spark):
    """After line dedup + the fingerprint keeper, no two surviving docs
    carry identical deduped text."""
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline42 import (
        q_llm_corpus_pipeline_v2,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import _lines_df

    out_docs = {r.doc_id for r in q_llm_corpus_pipeline_v2(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lines = _lines_df(docs)
    keepers = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_id")).alias("first_at")
    )
    rebuilt = (
        lines.join(keepers, "line")
        .filter(
            (F.col("doc_id") == F.col("first_at.doc_id"))
            & (F.col("line_id") == F.col("first_at.line_id"))
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("text")
        )
        .collect()
    )
    texts = [r.text for r in rebuilt if r.doc_id in out_docs]
    assert len(texts) == len(set(texts))
