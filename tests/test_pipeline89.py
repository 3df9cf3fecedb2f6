"""Unit tests for batch-89: operational analytics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_campaign_lift_shapes(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline89 import (
        q_campaign_lift_report,
    )

    rows = {r.campaign_day: r for r in q_campaign_lift_report(spark, SF).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.purchase_rate_ppm == r.n_purchases * 1_000_000 // r.n_events
        assert r.events_per_day_micro == r.n_events * 1_000_000 // r.n_days


def test_field_change_matrix_partition(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline89 import (
        q_field_change_matrix,
    )

    rows = q_field_change_matrix(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    cells = {(r.price_changed, r.priority_changed) for r in rows}
    assert (1, 0) in cells and (0, 1) in cells  # both single-field classes fire


def test_twab_between_min_max_balance(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline89 import (
        q_time_weighted_balance,
    )

    rows = q_time_weighted_balance(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.span_us > 0 and r.n_segments >= 1
        assert r.twab_cents > 0  # purchase deltas are positive


def test_srm_identity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline89 import q_srm_check

    (r,) = q_srm_check(spark, SF).collect()
    assert r.srm_chi2_micro == (r.n0 - r.n1) ** 2 * 1_000_000 // (r.n0 + r.n1)
    assert r.srm_flag == (1 if r.srm_chi2_micro > 3_841_459 else 0)


def test_interaction_grid_covers_rows(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline89 import (
        q_interaction_means_2way,
    )

    rows = q_interaction_means_2way(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == li
    assert all(r.mean_qty_micro >= 1_000_000 for r in rows)
