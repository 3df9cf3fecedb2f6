"""Unit tests for batch-73: search-engine machinery."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def _write_docs(spark, d, texts):
    spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")


def test_phrase_search_adjacency_only(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline73 import (
        q_phrase_search_positional,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                "a hash join b hash join",   # 2 occurrences
                "hash x join",               # NOT adjacent
                "join hash",                 # wrong order
            ],
        )
        out = {r.doc_id: r for r in q_phrase_search_positional(spark, d).collect()}
    assert set(out) == {1}
    assert out[1].n_occurrences == 2 and out[1].first_pos == 2


def test_trgm_candidates_verified(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline73 import (
        q_substring_trgm_search,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                "window windows shadow",  # window/windows match 'ndow'
                "endow meadow",           # endow contains 'ndow'; meadow has 'dow' only
                "nothing here",
            ],
        )
        out = {r.doc_id: r for r in q_substring_trgm_search(spark, d).collect()}
    assert out[1].n_matching_terms == 2  # window, windows
    assert out[2].n_matching_terms == 1 and out[2].first_term == "endow"
    assert 3 not in out


def test_symspell_finds_correction(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline73 import (
        q_symspell_suggest,
    )

    rows = q_symspell_suggest(spark, SF).collect()
    assert rows
    assert rows[0].term == "window"  # 'winow' -> the real corpus term
    assert rows[0].dist == 1


def test_kwic_window_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline73 import (
        q_kwic_snippets,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, ["spark a b", "x y spark", "a b c spark d e"])
        rows = {(r.doc_id, r.pos): r.snippet for r in q_kwic_snippets(spark, d).collect()}
    assert rows[(1, 1)] == "spark a b"
    assert rows[(2, 3)] == "x y spark"
    assert rows[(3, 4)] == "b c spark d e"


def test_boolean_retrieval_semantics(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline73 import (
        q_boolean_retrieval,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                "scan join ok",          # matches
                "scan join merge bad",   # excluded by NOT merge
                "scan only",             # missing join
                "join only",             # missing scan
            ],
        )
        out = {r.doc_id for r in q_boolean_retrieval(spark, d).collect()}
    assert out == {1}
