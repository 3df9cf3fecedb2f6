"""Unit tests for batch-26: published training-data quality rules
(Gopher document-shape/repetition filters, C4 line filtering)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_gopher_flags_keep_is_conjunction(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import q_gopher_quality_flags

    rows = q_gopher_quality_flags(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.word_count_ok and r.mean_len_ok and r.stopword_ok)
        # mean reported = chars/words exactly
        assert 1.0 <= r.mean_word_len <= 20.0


def test_dup_line_fraction_doubled_docs_dominate(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import q_dup_line_fraction

    rows = {r.doc_id: r for r in q_dup_line_fraction(spark, SF).collect()}
    assert rows
    doubled = [r for d, r in rows.items() if d % 5 == 0]
    clean = [r for d, r in rows.items() if d % 5 != 0]
    # a doubled doc's second copy realigns to duplicate whole lines only
    # when its token count divides the 8-token line width (~1/8 of them),
    # so the doubled mean is far above the clean mean but well below 1
    assert sum(r.dup_line_char_frac for r in doubled) / len(doubled) > 3 * (
        sum(r.dup_line_char_frac for r in clean) / len(clean) + 0.01
    )
    assert max(r.dup_line_char_frac for r in doubled) > 0.9
    for r in rows.values():
        assert 0.0 <= r.dup_line_char_frac <= 1.0
        assert r.dup_chars <= r.total_chars


def test_top_ngram_coverage_bounded_and_counted(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import q_top_ngram_char_frac

    rows = q_top_ngram_char_frac(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.gram_count >= 1 and " " in r.top_gram
        assert 0.0 < r.top_gram_char_frac <= 1.0
        assert r.covered_chars == r.gram_count * len(r.top_gram)


def test_c4_line_filter_conservation(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import q_c4_line_filter

    rows = q_c4_line_filter(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.kept_lines <= r.n_lines
        assert 0 <= r.kept_chars <= r.total_chars
        assert r.keep_doc == (r.kept_lines >= 3)
    # the md5-parity stand-in keeps roughly half the (>=5-word) lines
    kept = sum(r.kept_lines for r in rows)
    total = sum(r.n_lines for r in rows)
    assert 0.25 < kept / total < 0.75
