"""Unit tests for batch-71: BOM, OLS, changepoint, hazard, LTV."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_bom_quantities_multiply(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline71 import (
        q_bom_explosion,
    )

    rows = q_bom_explosion(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.deepest_lvl in (1, 2)
        assert r.total_qty >= 1
        # level-1 edge quantities are 1..4; a level-2 path multiplies two
        if r.deepest_lvl == 2:
            assert r.total_qty <= 4 * 4 + 4  # path product + possible L1 hit


def test_ols_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline71 import (
        q_ols_slope_exact,
    )

    rows = q_ols_slope_exact(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.slope_den > 0  # variance positive
        # truncated micro slope matches the exact fraction
        num = r.slope_num * 1_000_000
        trunc = abs(num) // r.slope_den * (1 if num >= 0 else -1)
        assert r.slope_micro == trunc


def test_changepoint_single_row(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline71 import (
        q_changepoint_binary_split,
    )

    (r,) = q_changepoint_binary_split(spark, SF).collect()
    assert r.split_index >= 1 and r.criterion_micro > 0


def test_hazard_at_risk_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline71 import (
        q_churn_hazard_report,
    )

    rows = sorted(q_churn_hazard_report(spark, SF).collect(), key=lambda r: r.off)
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.n_at_risk <= a.n_at_risk  # risk set shrinks with offset
    for r in rows:
        assert 0 <= r.n_churned_here <= r.n_at_risk
        assert r.hazard_ppm == r.n_churned_here * 1_000_000 // r.n_at_risk


def test_ltv_cumulative_chain(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline71 import (
        q_cohort_ltv_triangle,
    )

    rows = q_cohort_ltv_triangle(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.m_off)
        cum = 0
        for r in rs:
            cum += r.cents
            assert r.cum_cents == cum
            assert r.buyers <= r.cohort_users
            assert r.ltv_cents_per_user == cum // r.cohort_users
