"""Unit tests for batch-77: interval analytics + BI presentation."""

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


def test_sweepline_peak_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline77 import (
        q_concurrent_sessions_profile,
    )

    with tempfile.TemporaryDirectory() as d:
        # three users online simultaneously 10:00-10:05; one alone later
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 10:00:00", 1, "view", 0.0, ""),
                (2, "2024-01-01 10:05:00", 1, "view", 0.0, ""),
                (3, "2024-01-01 10:01:00", 2, "view", 0.0, ""),
                (4, "2024-01-01 10:04:00", 2, "view", 0.0, ""),
                (5, "2024-01-01 10:02:00", 3, "view", 0.0, ""),
                (6, "2024-01-01 10:03:00", 3, "view", 0.0, ""),
                (7, "2024-01-01 15:00:00", 4, "view", 0.0, ""),
            ],
        )
        (r,) = q_concurrent_sessions_profile(spark, d).collect()
    assert r.peak_concurrency == 3


def test_interval_merge_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline77 import (
        q_merge_overlapping_intervals,
    )

    with tempfile.TemporaryDirectory() as d:
        # one user: sessions [10:00,10:10] and [12:00,12:05] (gap > 30m
        # splits them); both become separate episodes
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 10:00:00", 1, "view", 0.0, ""),
                (2, "2024-01-01 10:10:00", 1, "view", 0.0, ""),
                (3, "2024-01-01 12:00:00", 1, "view", 0.0, ""),
                (4, "2024-01-01 12:05:00", 1, "view", 0.0, ""),
            ],
        )
        (r,) = q_merge_overlapping_intervals(spark, d).collect()
    assert r.n_episodes == 2
    assert r.busy_us == (10 * 60 + 5 * 60) * 1_000_000
    assert r.span_us == 125 * 60 * 1_000_000


def test_topn_other_preserves_totals(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline77 import (
        q_topn_plus_other,
    )

    rows = q_topn_plus_other(spark, SF).collect()
    per_nation_named = {}
    for r in rows:
        if r.bucket != "__other__":
            per_nation_named[r.nation] = per_nation_named.get(r.nation, 0) + 1
            assert r.n_customers == 1
    assert all(v <= 3 for v in per_nation_named.values())
    # totals match the raw revenue rollup
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    total = (
        orders.join(cust, cust["c_custkey"] == orders["o_custkey"])
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .agg(F.sum("c"))
        .first()[0]
    )
    assert sum(r.cents for r in rows) == total


def test_equi_depth_buckets(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline77 import (
        q_equi_depth_histogram,
    )

    rows = sorted(q_equi_depth_histogram(spark, SF).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal depth
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents  # ordered, non-overlapping ranges


def test_pivot_matches_case_sums(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline77 import (
        q_sql_pivot_native,
    )

    rows = {r.nation: r for r in q_sql_pivot_native(spark, SF).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for r in rows.values():
        assert r.urgent_cents >= 0 and r.high_cents >= 0 and r.medium_cents >= 0
