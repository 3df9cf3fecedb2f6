"""Unit tests for batch-49: bitemporal as-of, point-in-polygon."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_bitemporal_believed_vs_eventual(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline49 import (
        _US_HOUR,
        q_bitemporal_asof,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_us"),
        )
        .collect()
    )
    vs = [r.valid_us for r in ev]
    v = (min(vs) + max(vs)) // 2
    t = v + 2 * _US_HOUR

    def elect(rows):
        # same election rule as the query: second-granularity gap,
        # event_id tie-break
        return min(((v - r.valid_us) // 1_000_000, r.event_id) for r in rows)[1]

    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    got = {r.user_id: r for r in q_bitemporal_asof(spark, SF).collect()}
    for user, rows in per_user.items():
        valid = [r for r in rows if r.valid_us <= v]
        known = [
            r for r in valid if r.valid_us + (r.event_id % 5) * _US_HOUR <= t
        ]
        if not valid or not known:
            assert user not in got
            continue
        g = got[user]
        assert g.eventual_event == elect(valid)
        assert g.believed_event == elect(known)
        assert g.superseded == (g.believed_event != g.eventual_event)
        if not g.superseded:
            assert g.believed_cents == g.eventual_cents


def test_point_in_polygon_matches_shoelace_reference(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline49 import (
        _POLY,
        q_point_in_polygon,
    )

    def inside_ref(x, y):
        signs = []
        n = len(_POLY)
        for i in range(n):
            ax, ay = _POLY[i]
            bx, by = _POLY[(i + 1) % n]
            signs.append((bx - ax) * (y - ay) - (by - ay) * (x - ax))
        return all(s >= 0 for s in signs) or all(s <= 0 for s in signs)

    rows = q_point_in_polygon(spark, SF).collect()
    assert rows
    n_inside = 0
    for r in rows:
        assert r.inside == inside_ref(r.x, r.y)
        n_inside += int(r.inside)
    # the synthetic grid straddles the polygon: both classes present
    assert 0 < n_inside < len(rows)
