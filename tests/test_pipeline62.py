"""Unit tests for batch-62: rolling active users."""

from __future__ import annotations

import datetime as dt

SF = "/root/testdata/sf0.001"


def test_rolling_active_users_invariants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline62 import (
        q_rolling_active_users,
    )

    rows = q_rolling_active_users(spark, SF).collect()
    assert rows
    for r in rows:
        # WAU is a superset count of DAU; stickiness in (0, 1] ppm
        assert 1 <= r.dau <= r.wau
        assert r.stickiness_ppm == r.dau * 1_000_000 // r.wau
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_rolling_window_attribution(spark):
    """A user active on day D counts toward WAU of D..D+6 only."""
    import tempfile

    from prosnet_prefect_pipelines_spark.plans.q_pipeline62 import (
        q_rolling_active_users,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "2024-03-01 10:00:00", 1, "view", 1.0, ""),
                (2, "2024-03-05 10:00:00", 2, "view", 1.0, ""),
                (3, "2024-03-20 10:00:00", 3, "view", 1.0, ""),
            ],
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(f"{d}/events.parquet")
        out = {r.day: r for r in q_rolling_active_users(spark, d).collect()}
    # only DAU days appear
    assert set(out) == {"2024-03-01", "2024-03-05", "2024-03-20"}
    # user 1's Mar-1 activity still counts toward Mar-5's trailing week
    assert out["2024-03-01"].wau == 1
    assert out["2024-03-05"].dau == 1 and out["2024-03-05"].wau == 2
    # Mar-20 is far outside every other window
    assert out["2024-03-20"].wau == 1
