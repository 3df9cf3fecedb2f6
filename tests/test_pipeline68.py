"""Unit tests for batch-68: MoM growth, dwell times, 2-D histogram,
reconciliation, fixed-width round-trip."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def test_mom_growth_chain(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline68 import (
        q_mom_growth_report,
    )

    rows = q_mom_growth_report(spark, SF).collect()
    assert rows
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.month)
        assert rs[0].prev_cents is None and rs[0].growth_bps is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur.prev_cents == prev.cents
            # engines truncate toward zero; Python // floors — emulate trunc
            num = (cur.cents - prev.cents) * 10_000
            trunc = abs(num) // prev.cents * (1 if num >= 0 else -1)
            assert cur.growth_bps == trunc


def test_dwell_times_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline68 import (
        q_state_dwell_times,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 1, "view", 0.0, ""),
                (2, "2024-01-01 00:01:00", 1, "click", 0.0, ""),
                (3, "2024-01-01 00:04:00", 1, "view", 0.0, ""),  # terminal
            ],
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(f"{d}/events.parquet")
        out = {r.state: r for r in q_state_dwell_times(spark, d).collect()}
    assert out["view"].n_stays == 1 and out["view"].total_dwell_us == 60_000_000
    assert out["click"].total_dwell_us == 180_000_000
    assert set(out) == {"view", "click"}  # terminal view event dropped


def test_hist2d_partition_of_rows(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline68 import q_hist2d_bins

    rows = q_hist2d_bins(spark, SF).collect()
    li_count = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == li_count
    assert all(0 <= r.q_bin <= 4 for r in rows)  # quantities 1..50


def test_reconciliation_covers_all_orders(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline68 import (
        q_reconciliation_report,
    )

    rows = q_reconciliation_report(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert {r.status for r in rows} <= {"exact", "within_1pct", "mismatch", "no_lines"}


def test_fixed_width_exact_roundtrip(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline68 import (
        q_fixed_width_roundtrip,
    )

    out = {r.n_regionkey: r for r in q_fixed_width_roundtrip(spark, SF).collect()}
    src = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_name").alias("first_name"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .collect()
    )
    for r in src:
        assert out[r.n_regionkey].n == r.n
        assert out[r.n_regionkey].first_name == r.first_name
        assert out[r.n_regionkey].key_sum == r.key_sum
