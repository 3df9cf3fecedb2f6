"""Unit tests for batch-79: exact nonparametric statistics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ks_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline79 import (
        q_ks_statistic_exact,
    )

    (r,) = q_ks_statistic_exact(spark, SF).collect()
    assert r.n1 > 0 and r.n2 > 0
    assert 0 <= r.ks_micro <= 1_000_000
    assert r.ks_numerator <= r.n1 * r.n2


def test_mwu_invariant(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline79 import (
        q_mannwhitney_u_exact,
    )

    (r,) = q_mannwhitney_u_exact(spark, SF).collect()
    # U1 + U2 = n1 * n2 (doubled throughout)
    assert r.u1_x2 + r.u2_x2 == 2 * r.n1 * r.n2
    assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2


def test_spearman_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline79 import (
        q_spearman_rank_corr,
    )

    (r,) = q_spearman_rank_corr(spark, SF).collect()
    assert r.rho_sign in (-1, 0, 1)
    assert 0 <= r.rho2_ppm <= 1_000_000


def test_runs_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline79 import (
        q_runs_test_exact,
    )

    (r,) = q_runs_test_exact(spark, SF).collect()
    # runs bounded by 1..n and by 2*min+1
    n = r.n_above + r.n_not_above
    assert 1 <= r.n_runs <= n
    assert r.n_runs <= 2 * min(r.n_above, r.n_not_above) + 1


def test_sign_counts_partition_pairs(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline79 import (
        q_sign_test_counts,
    )

    rows = q_sign_test_counts(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_up + r.n_down + r.n_tie >= 1
        assert r.n_up >= 0 and r.n_down >= 0 and r.n_tie >= 0
