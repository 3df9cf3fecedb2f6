"""Unit tests for batch-40: calendar spine, LOCF fill, clamped
balance fold."""

from __future__ import annotations

import datetime as dt

SF = "/root/testdata/sf0.001"


def test_date_spine_calendar_facts(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline40 import (
        _SPINE_HI,
        _SPINE_LO,
        q_date_dimension_spine,
    )

    rows = {r.day: r for r in q_date_dimension_spine(spark, SF).collect()}
    lo = dt.date.fromisoformat(_SPINE_LO)
    hi = dt.date.fromisoformat(_SPINE_HI)
    assert len(rows) == (hi - lo).days + 1
    for day, r in rows.items():
        d = dt.date.fromisoformat(day)
        assert r.iso_dow == d.isoweekday()
        assert r.is_weekend == (d.isoweekday() >= 6)
        assert r.month_key == d.year * 100 + d.month
        assert r.q == (d.month - 1) // 3 + 1
        nxt = dt.date.fromisoformat(r.month_end) + dt.timedelta(days=1)
        assert nxt.day == 1
        assert r.is_month_end == (day == r.month_end)


def test_locf_fill_carries_forward(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline40 import q_locf_fill

    by_user: dict[int, list] = {}
    for r in q_locf_fill(spark, SF).collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.hour_idx)
        # dense hourly grid
        assert [r.hour_idx for r in rs] == list(
            range(rs[0].hour_idx, rs[-1].hour_idx + 1)
        )
        # first and last grid hours are observations by construction
        assert not rs[0].was_filled and not rs[-1].was_filled
        last = None
        for r in rs:
            if r.was_filled:
                assert r.observed_cents == 0
                assert r.filled_cents == last
            else:
                assert r.filled_cents == r.observed_cents
                last = r.filled_cents


def test_clamped_balance_matches_python_fold(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline40 import (
        q_stock_balance_clamped,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_type",
            "value",
        )
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in ev:
        d = round(r.value * 100)
        per_user.setdefault(r.user_id, []).append(
            (r.ts_us, r.event_id, d if r.event_type == "purchase" else -d)
        )
    got = {r.user_id: r for r in q_stock_balance_clamped(spark, SF).collect()}
    assert set(got) == set(per_user)
    for user, moves in per_user.items():
        moves.sort()
        acc = 0
        for _, _, d in moves:
            acc = max(acc + int(d), 0)
        net = sum(d for _, _, d in moves)
        r = got[user]
        assert r.final_cents == acc
        assert r.n_moves == len(moves)
        assert r.net_cents == net
        assert r.clamp_gain_cents == acc - max(net, 0) >= 0
