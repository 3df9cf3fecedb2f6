"""Unit tests for batch-27: CCNet corpus stages (corpus-global line
dedup, per-language perplexity-proxy tertile buckets)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_line_dedup_crossdoc_invariants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline27 import q_line_dedup_crossdoc

    rows = {r.doc_id: r for r in q_line_dedup_crossdoc(spark, SF).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.kept_lines <= r.n_lines
        assert 0 <= r.kept_chars <= r.total_chars
        assert 0 <= r.retained_micro <= 1_000_000
        # rebuilt text's char mass matches the kept-char accounting
        # (kept_lines-1 single-space joins)
        joins = max(r.kept_lines - 1, 0)
        assert len(r.kept_text) == r.kept_chars + joins
    # a doubled doc's second copy realigns to whole duplicate lines only
    # when its token count divides the 8-token line width, and the
    # corpus also carries exact-duplicate documents — so some (not all)
    # docs must lose lines, and nothing may gain
    assert any(r.kept_lines < r.n_lines for r in rows.values())
    assert all(r.kept_lines <= r.n_lines for r in rows.values())


def test_line_dedup_crossdoc_global_uniqueness(spark):
    """After dedup no surviving line text occurs twice corpus-wide."""
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import (
        _docs,
        _doubled,
        _lines_df,
    )

    lines = _lines_df(_doubled(_docs(spark, SF)))
    keepers = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_id")).alias("first_at")
    )
    survivors = lines.join(keepers, "line").filter(
        (F.col("doc_id") == F.col("first_at.doc_id"))
        & (F.col("line_id") == F.col("first_at.line_id"))
    )
    dups = survivors.groupBy("line").count().filter(F.col("count") > 1).count()
    assert dups == 0


def test_ccnet_buckets_tertile_shape(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline27 import q_ccnet_lm_buckets

    rows = q_ccnet_lm_buckets(spark, SF).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.bucket in ("head", "middle", "tail")
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        c = Counter(r.bucket for r in rs)
        # threshold semantics: head covers at least the top third (ties
        # at the cut all land high), and head+middle at least two thirds
        assert c["head"] * 3 >= n
        assert (c["head"] + c["middle"]) * 3 >= 2 * n
        # bucket order respects score order: min(head) >= max(middle) etc.
        if c["head"] and c["middle"]:
            assert min(r.score_micro for r in rs if r.bucket == "head") >= max(
                r.score_micro for r in rs if r.bucket == "middle"
            )
        if c["middle"] and c["tail"]:
            assert min(r.score_micro for r in rs if r.bucket == "middle") > max(
                r.score_micro for r in rs if r.bucket == "tail"
            )
