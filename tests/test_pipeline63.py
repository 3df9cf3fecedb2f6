"""Unit tests for batch-63: bigram LM, readability, PRF expansion,
class balancing, association rules."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def test_bigram_lm_known_corpus(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        q_bigram_lm_score,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "a b a b", "en", "s", 7),
                (2, "a b c", "en", "s", 5),
                (3, "x", "en", "s", 1),  # <2 tokens -> no bigrams, no row
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.id: r for r in q_bigram_lm_score(spark, d).collect()}
    assert set(out) == {1, 2}
    # corpus bigrams: doc1: (a b) x2, (b a) x1; doc2: (a b), (b c)
    # c2: "a b"=3, "b a"=1, "b c"=1 ; c1: a·=3, b·=2
    # doc1 ps: ab=3e6//3=1e6 (x2), ba=1e6//2=500000 -> mean=(2.5e6)//3
    r1 = out[1]
    assert r1.n_bigrams == 3
    assert r1.mean_bigram_p_micro == (1_000_000 + 1_000_000 + 500_000) // 3
    # rare: c2<=2 only "b a" -> 1/3
    assert r1.rare_bigram_frac_micro == 1_000_000 // 3
    r2 = out[2]
    assert r2.n_bigrams == 2
    # ab=1e6, bc=1e6//2... c1 for b=2 -> bc=500000
    assert r2.mean_bigram_p_micro == (1_000_000 + 500_000) // 2


def test_readability_known_text(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        q_readability_scores,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "The cat sat. The dog ran!", "en", "s", 25)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        (r,) = q_readability_scores(spark, d).collect()
    assert r.n_sentences == 2 and r.n_words == 6
    # each word has exactly one vowel group
    assert r.n_syllables == 6
    assert r.flesch_milli == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6


def test_prf_excludes_query_terms(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        _PRF_TERMS,
        q_prf_query_expansion,
    )

    rows = q_prf_query_expansion(spark, SF).collect()
    assert 0 < len(rows) <= 8
    assert all(r.term not in _PRF_TERMS for r in rows)
    tfs = [r.total_tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)


def test_class_balance_exact_counts(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        q_class_balance_plan,
    )

    out = q_class_balance_plan(spark, SF)
    per = (
        out.groupBy("label")
        .agg(
            F.sum("kept").alias("kept"),
            F.count(F.lit(1)).alias("total"),
        )
        .collect()
    )
    kept = {r.label: r.kept for r in per}
    # every class keeps exactly the minority-class count
    assert len(set(kept.values())) == 1
    assert set(kept.values()) == {min(r.total for r in per)}


def test_assoc_rules_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        q_assoc_rules_lift,
    )

    rows = q_assoc_rules_lift(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a < r.b and r.n_ab >= 5
        assert 0 < r.support_ppm <= 1_000_000
        # confidence >= support direction-wise; lift symmetric identity:
        # lift = conf_ab / support(b) = conf_ba / support(a) — check via
        # the raw integer definition instead of re-deriving floats
        assert r.conf_ab_ppm >= r.support_ppm
        assert r.conf_ba_ppm >= r.support_ppm
        assert r.lift_ppm > 0
