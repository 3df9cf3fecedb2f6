"""Unit tests for batch-100: lexical diversity & vocabulary statistics.

Hand corpus: doc1 = "a b b c c c", doc2 = "a d" -> frequencies
a:2 b:2 c:3 d:1, so N=8, V=4, V1=1, V2=2, F2=18; every statistic below
is computed by hand from those sufficient statistics.
"""

from __future__ import annotations

import math

import pytest


def _write_docs(spark, path, texts):
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts, start=1)
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


CORPUS = ["a b b c c c", "a d"]


def test_yules_k_hand(spark, tmp_path):
    """K = 1e4 * (F2 - N)/N^2 = 1e4 * 10/64 = 1562.5."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_yules_k_vocab,
    )

    _write_docs(spark, tmp_path, CORPUS)
    got = q_yules_k_vocab(spark, str(tmp_path)).collect()[0]
    assert got["n_tokens"] == 8 and got["vocab"] == 4
    assert got["yules_k"] == pytest.approx(1562.5, abs=1e-6)


def test_simpson_hand(spark, tmp_path):
    """D = 10/56, Gini-Simpson = 46/56."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_simpson_vocab_diversity,
    )

    _write_docs(spark, tmp_path, CORPUS)
    got = q_simpson_vocab_diversity(spark, str(tmp_path)).collect()[0]
    assert got["simpson_d"] == pytest.approx(10 / 56, abs=1e-6)
    assert got["gini_simpson"] == pytest.approx(46 / 56, abs=1e-6)


def test_ttr_hapax_hand(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_ttr_hapax_profile,
    )

    _write_docs(spark, tmp_path, CORPUS)
    got = q_ttr_hapax_profile(spark, str(tmp_path)).collect()[0]
    assert (got["n_tokens"], got["vocab"], got["hapax"], got["dis"]) == (
        8, 4, 1, 2,
    )
    assert got["ttr"] == pytest.approx(0.5, abs=1e-9)
    assert got["hapax_ratio"] == pytest.approx(0.25, abs=1e-9)
    assert got["guiraud_r"] == pytest.approx(4 / math.sqrt(8), abs=1e-6)


def test_vocab_concentration_hand(spark, tmp_path):
    """HHI = 18/64; Renyi-2 = -ln(18/64)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_vocab_concentration,
    )

    _write_docs(spark, tmp_path, CORPUS)
    got = q_vocab_concentration(spark, str(tmp_path)).collect()[0]
    assert got["hhi"] == pytest.approx(18 / 64, abs=1e-9)
    assert got["renyi2_entropy"] == pytest.approx(-math.log(18 / 64), abs=1e-6)


def test_vocab_growth_two_docs(spark, tmp_path):
    """Types a,b,c first appear in doc rank 1 (decile 5 of 2 docs),
    d in rank 2 (decile 10): rows (5,3,3), (10,1,4)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_vocab_growth_deciles,
    )

    _write_docs(spark, tmp_path, CORPUS)
    got = [
        (r["decile"], r["new_types"], r["vocab_cum"])
        for r in q_vocab_growth_deciles(spark, str(tmp_path)).collect()
    ]
    assert got == [(5, 3, 3), (10, 1, 4)]


def test_token_length_moments_mixed(spark, tmp_path):
    """Tokens aa, b, cccc: lengths 2,1,4 -> mean 7/3, pop var
    (3*21 - 49)/9 = 14/9, max 4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline100 import (
        q_token_length_moments,
    )

    _write_docs(spark, tmp_path, ["aa b", "cccc"])
    got = q_token_length_moments(spark, str(tmp_path)).collect()[0]
    assert got["n_tokens"] == 3 and got["max_len"] == 4
    assert got["mean_len"] == pytest.approx(7 / 3, abs=1e-6)
    assert got["var_len"] == pytest.approx(14 / 9, abs=1e-6)
