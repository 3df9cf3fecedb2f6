"""Unit tests for batch-38: PIT dimension join, time-decay attribution."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pit_join_no_future_leakage(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline38 import q_scd2_pit_join

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_id",
        )
        .collect()
    )
    dim: dict[int, list] = {}
    purchases = []
    for r in ev:
        if r.event_type in ("signup", "click", "view"):
            dim.setdefault(r.user_id, []).append((r.ts_us, r.event_type))
        elif r.event_type == "purchase":
            purchases.append(r)
    for v in dim.values():
        v.sort()
    got = {r.event_id: r for r in q_scd2_pit_join(spark, SF).collect()}
    assert len(got) == len(purchases)
    for p in purchases:
        states = [s for t, s in dim.get(p.user_id, []) if t <= p.ts_us]
        want = states[-1] if states else None
        assert got[p.event_id].state_at_purchase == want


def test_time_decay_shares_sum_and_order(spark):
    from collections import defaultdict

    from prosnet_prefect_pipelines_spark.plans.q_pipeline38 import (
        _MAX_TOUCHES,
        q_attribution_time_decay,
    )

    rows = q_attribution_time_decay(spark, SF).collect()
    assert rows
    by_conv = defaultdict(list)
    for r in rows:
        by_conv[r.conv_id].append(r)
    for conv_id, rs in by_conv.items():
        rs.sort(key=lambda r: r.recency_rank)
        assert [r.recency_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _MAX_TOUCHES
        n = len(rs)
        # exact share law: rank r gets 2^(n-r)/(2^n - 1)
        for r in rs:
            assert r.share_ppm == (1 << (n - r.recency_rank)) * 1_000_000 // (
                (1 << n) - 1
            )
        total = sum(r.share_ppm for r in rs)
        assert abs(total - 1_000_000) <= n  # floor rounding only
        # strictly decreasing with recency rank (most recent = most credit)
        shares = [r.share_ppm for r in rs]
        assert shares == sorted(shares, reverse=True)
