"""Unit tests for batch-64: EWMA, integer sigma outliers, path mining,
Benford audit, overlap pairs."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    ).write.parquet(f"{d}/events.parquet")


def test_ewma_recurrence_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline64 import (
        q_ewma_per_user,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 00:00:00", 7, "view", 4.0, ""),
                (2, "2024-01-01 00:01:00", 7, "view", 8.0, ""),
                (3, "2024-01-01 00:02:00", 7, "view", 1.0, ""),
                (4, "2024-01-01 00:00:30", 9, "view", 2.5, ""),
            ],
        )
        out = {r.user_id: r for r in q_ewma_per_user(spark, d).collect()}
    # user 7: s0=4e6; s1=(3*4e6+8e6)//4=5e6; s2=(3*5e6+1e6)//4=4e6
    assert out[7].n_events == 3 and out[7].ewma_micro == 4_000_000
    # single event: EWMA = the value
    assert out[9].n_events == 1 and out[9].ewma_micro == 2_500_000


def test_sigma_outliers_pure_integer(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline64 import (
        q_sigma_outliers_exact,
    )

    rows = q_sigma_outliers_exact(spark, SF).collect()
    assert rows and all(r.n_outliers >= 0 and r.n > 0 for r in rows)
    # quantities are uniform-ish 1..50: a 3-sigma band covers everything
    for r in rows:
        assert r.n_outliers == 0
        assert 1_000_000 <= r.mean_micro <= 50_000_000


def test_path_trigrams_order_and_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline64 import (
        q_path_trigrams_top,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 00:00:00", 1, "view", 0.0, ""),
                (2, "2024-01-01 00:01:00", 1, "click", 0.0, ""),
                (3, "2024-01-01 00:02:00", 1, "purchase", 0.0, ""),
                (4, "2024-01-01 00:03:00", 1, "view", 0.0, ""),
                (5, "2024-01-01 00:00:00", 2, "view", 0.0, ""),
                (6, "2024-01-01 00:01:00", 2, "click", 0.0, ""),
                (7, "2024-01-01 00:02:00", 2, "purchase", 0.0, ""),
                (8, "2024-01-01 00:00:00", 3, "view", 0.0, ""),  # too short
            ],
        )
        rows = q_path_trigrams_top(spark, d).collect()
    paths = {r.path: r.n for r in rows}
    assert paths["view>click>purchase"] == 2
    assert paths["click>purchase>view"] == 1
    assert len(paths) == 2  # user 3 contributes nothing


def test_benford_audit_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline64 import (
        q_benford_digit_audit,
    )

    rows = q_benford_digit_audit(spark, SF).collect()
    assert 1 <= len(rows) <= 9
    assert sum(r.obs_ppm for r in rows) <= 1_000_000 + 9  # truncation slack
    for r in rows:
        assert 1 <= r.digit <= 9
        assert r.dev_ppm == abs(r.obs_ppm - r.benford_ppm)


def test_supplier_overlap_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline64 import (
        q_supplier_overlap_pairs,
    )

    rows = q_supplier_overlap_pairs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a < r.b and r.n_shared >= 3
        assert 0 < r.overlap_ppm <= 1_000_000
