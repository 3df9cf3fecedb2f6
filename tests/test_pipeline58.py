"""Unit tests for batch-58: community quality, deterministic mode."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_community_quality_invariants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline58 import q_community_quality

    rows = q_community_quality(spark, SF).collect()
    assert rows
    m = (sum(r.e_in for r in rows) * 2 + sum(r.cut for r in rows)) // 2
    for r in rows:
        # volume counts each internal edge twice and each cut edge once
        assert r.vol == 2 * r.e_in + r.cut
        assert 0.0 <= r.conductance <= 1.0 + 1e-9
        assert -1.0 <= r.modularity_contrib <= 1.0
    # total edge mass is consistent: sum vol = 2m
    assert sum(r.vol for r in rows) == 2 * m


def test_community_quality_perfect_partition(spark):
    """Hand-built graph: two cliques, no crossing edges — modularity
    contribution is positive, conductance zero (checked through the
    same formulas on a tiny frame via SQL on the oracle shape)."""
    from pyspark.sql import functions as F

    # K3 on {1,2,3} and K3 on {4,5,6}; communities X and Y
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)], "a long, b long"
    )
    comm = spark.createDataFrame(
        [(i, "X") for i in (1, 2, 3)] + [(i, "Y") for i in (4, 5, 6)],
        "node long, community string",
    )
    tagged = edges.join(
        comm.select(F.col("node").alias("a"), F.col("community").alias("ca")), "a"
    ).join(comm.select(F.col("node").alias("b"), F.col("community").alias("cb")), "b")
    assert tagged.filter(F.col("ca") != F.col("cb")).count() == 0
    e_in = {
        r.ca: r.c
        for r in tagged.groupBy("ca").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # each community holds half the edges: contribution 3/6 - (6/12)^2 = 0.25
    m = 6
    for c, e in e_in.items():
        assert abs(e / m - (2 * e / (2 * m)) ** 2 - 0.25) < 1e-9


def test_mode_per_key_deterministic_ties(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline58 import q_mode_per_key

    rows = {r.user_id: r for r in q_mode_per_key(spark, SF).collect()}
    events = spark.read.parquet(f"{SF}/events.parquet")
    counts = (
        events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    ).collect()
    by_user = {}
    for r in counts:
        by_user.setdefault(r.user_id, []).append((r.c, r.event_type))
    assert set(rows) == set(by_user)
    for u, pairs in by_user.items():
        best = sorted(pairs, key=lambda p: (-p[0], p[1]))[0]
        assert (rows[u].n, rows[u].mode_event_type) == best
