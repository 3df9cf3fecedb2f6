"""Unit tests for batch-50: assortativity, burstiness."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_assortativity_matches_numpy(spark):
    import math

    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _und_edges
    from prosnet_prefect_pipelines_spark.plans.q_pipeline50 import (
        q_degree_assortativity,
    )

    edges = [(r.src, r.dst) for r in _und_edges(spark, SF).collect()]
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in edges]
    ys = [deg[b] for _, b in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    want = math.floor(
        (n * sxy - sx * sy)
        / math.sqrt(n * sxx - sx * sx)
        / math.sqrt(n * syy - sy * sy)
        * 1_000_000
    )
    r = q_degree_assortativity(spark, SF).collect()[0]
    assert r.n_directed_edges == n
    assert r.assortativity_micro == want
    assert -1_000_000 <= r.assortativity_micro <= 1_000_000


def test_burstiness_closed_form(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline50 import (
        _US_HOUR,
        q_activity_burstiness,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            F.expr(
                f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) div {_US_HOUR} AS BIGINT)"
            ).alias("h"),
        )
        .collect()
    )
    per_user: dict[int, Counter] = {}
    for r in ev:
        per_user.setdefault(r.user_id, Counter())[r.h] += 1
    got = {r.user_id: r for r in q_activity_burstiness(spark, SF).collect()}
    assert set(got) == set(per_user)
    for user, hours in per_user.items():
        n_hours = max(hours) - min(hours) + 1
        s1 = sum(hours.values())
        s2 = sum(c * c for c in hours.values())
        r = got[user]
        assert r.n_hours == n_hours and r.active_hours == len(hours)
        assert r.n_events == s1
        assert r.fano_micro == (n_hours * s2 - s1 * s1) * 1_000_000 // (s1 * n_hours)
        # bursty human-ish event streams: overdispersed or near-Poisson
        assert r.fano_micro >= 0
