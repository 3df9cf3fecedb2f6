"""Unit tests for batch-81: OLAP drill-down & temporal profiles."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_hierarchical_shares_sum(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline81 import (
        q_hierarchical_share_report,
    )

    rows = q_hierarchical_share_report(spark, SF).collect()
    assert rows
    # leaf shares within each nation sum to ~1e6 (truncation slack)
    per_nation = {}
    for r in rows:
        per_nation.setdefault((r.region, r.nation), []).append(r.share_of_nation_ppm)
    for key, shares in per_nation.items():
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000
    # region shares of total sum to ~1e6 over distinct regions
    region_shares = {r.region: r.region_share_of_total_ppm for r in rows}
    assert 1_000_000 - len(region_shares) <= sum(region_shares.values()) <= 1_000_000


def test_brand_transitions_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline81 import (
        q_repeat_purchase_transitions,
    )

    rows = q_repeat_purchase_transitions(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.loyal == (1 if r.brand == r.next_brand else 0)
        assert r.n >= 1


def test_weekend_split_covers_all_orders(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline81 import (
        q_weekend_effect_report,
    )

    rows = q_weekend_effect_report(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert {r.is_weekend for r in rows} <= {0, 1}


def test_new_vs_returning_first_month_new(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline81 import (
        q_new_vs_returning_report,
    )

    rows = q_new_vs_returning_report(spark, SF).collect()
    months = sorted({r.month for r in rows})
    first = months[0]
    # the earliest month can contain no 'returning' orders
    assert all(
        r.cohort == "new" for r in rows if r.month == first
    )


def test_dow_hour_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline81 import (
        q_dow_hour_heatmap,
    )

    rows = q_dow_hour_heatmap(spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n for r in rows) == n_events
    assert all(1 <= r.dow <= 7 and 0 <= r.hour <= 23 for r in rows)
