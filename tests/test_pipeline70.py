"""Unit tests for batch-70: ops/observability tier."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_sla_breach_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline70 import (
        q_sla_breach_report,
    )

    rows = q_sla_breach_report(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_breaches <= r.n_orders
        assert r.breach_ppm == r.n_breaches * 1_000_000 // r.n_orders
        if r.n_breaches > 0:
            assert r.worst_days > 30


def test_error_budget_burn_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline70 import (
        q_error_budget_burn,
    )

    rows = sorted(q_error_budget_burn(spark, SF).collect(), key=lambda r: r.hour)
    cum_e = cum_n = 0
    for r in rows:
        cum_e += r.errs
        cum_n += r.n
        assert r.cum_errs == cum_e and r.cum_n == cum_n
        assert r.cum_burn_ppm == cum_e * 1_000_000 // cum_n


def test_rank_movers_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline70 import (
        q_rank_movers_report,
    )

    rows = q_rank_movers_report(spark, SF).collect()
    assert 0 < len(rows) <= 15
    gains = [abs(r.rank_gain) for r in rows]
    assert gains == sorted(gains, reverse=True)
    for r in rows:
        assert r.rank_gain == r.p1_rank - r.p2_rank


def test_duplicate_payments_window(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline70 import (
        q_duplicate_payment_candidates,
    )

    rows = q_duplicate_payment_candidates(spark, SF).collect()
    assert rows  # the sf0.001 corpus has known whole-dollar collisions
    for r in rows:
        assert r.event_a < r.event_b
        assert abs(r.dt_us) <= 604_800_000_000


def test_freshness_report_watermark(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline70 import (
        q_freshness_report,
    )

    rows = q_freshness_report(spark, SF).collect()
    assert rows
    assert min(r.staleness_us for r in rows) == 0  # someone holds the watermark
    for r in rows:
        assert r.stale_over_1d == (1 if r.staleness_us > 86_400_000_000 else 0)
