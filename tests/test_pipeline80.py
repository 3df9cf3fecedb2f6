"""Unit tests for batch-80: relational linear algebra."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_matmul_linearity(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline80 import (
        q_sparse_matmul_coo,
    )

    out = q_sparse_matmul_coo(spark, SF)
    # every output row references a real doc and a topic in 0..3
    assert out.filter(~F.col("topic").between(0, 3)).count() == 0
    assert out.filter(F.col("value") == 0).count() == 0


def test_gram_symmetric_psd_diagonal(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline80 import (
        q_gram_matrix_exact,
    )

    rows = q_gram_matrix_exact(spark, SF).collect()
    # upper triangle of a 64x64 matrix: 64*65/2 entries
    assert len(rows) == 64 * 65 // 2
    diag = {r.di: r.gram_micro2 for r in rows if r.di == r.dj}
    assert len(diag) == 64
    assert all(v >= 0 for v in diag.values())  # x^T x diagonal is PSD


def test_analogy_excludes_inputs(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline80 import (
        q_vector_analogy_topk,
    )

    rows = q_vector_analogy_topk(spark, SF).collect()
    assert len(rows) == 3
    assert all(r.vec_id not in (1, 2, 3) for r in rows)
    coses = [r.cos for r in rows]
    assert coses == sorted(coses, reverse=True)


def test_markov2_rows_normalize(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline80 import (
        q_markov_two_step,
    )

    rows = q_markov_two_step(spark, SF).collect()
    per_from = {}
    for r in rows:
        per_from.setdefault(r.from_state, []).append(r.p2_ppm)
    for state, ps in per_from.items():
        assert 1_000_000 - len(ps) <= sum(ps) <= 1_000_000  # truncation slack


def test_cooccurrence_bounded_by_df(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline80 import (
        q_term_cooccurrence_matmul,
    )

    rows = q_term_cooccurrence_matmul(spark, SF).collect()
    assert 0 < len(rows) <= 66  # at most C(12, 2)
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows:
        assert r.t1 < r.t2
        assert 1 <= r.n_docs_both <= docs
