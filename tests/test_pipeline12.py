"""Unit tests for batch-12 operators: SCC (driver vs distributed
equivalence), islands, priority sampling, interval overlap, feature
hashing."""

from __future__ import annotations

from pyspark.sql import functions as F


def _scc_graph(spark):
    # three 4-cycles chained, one feeder chain (singleton SCCs)
    edges = []
    for blk in range(3):
        base = blk * 4
        for i in range(4):
            edges.append((str(base + i), str(base + (i + 1) % 4)))
        if blk < 2:
            edges.append((str(base), str(base + 4)))
    edges += [("90", "0"), ("91", "90")]
    return spark.createDataFrame(edges, "src string, dst string")


def test_scc_driver_vs_distributed(spark):
    from prosnet_prefect_pipelines_spark.operators.graph import scc_components

    e = _scc_graph(spark)
    a = {(r.node, r.scc) for r in scc_components(e).collect()}
    b = {(r.node, r.scc) for r in scc_components(e, driver_threshold=0).collect()}
    assert a == b
    # block cycles are SCCs labeled by max member; feeders are singletons
    got = dict(a)
    assert got["0"] == "3" and got["5"] == "7" and got["9"] == "9"
    assert got["90"] == "90" and got["91"] == "91"


def test_islands_basic(spark):
    from prosnet_prefect_pipelines_spark.operators.aggregates import islands

    df = spark.createDataFrame(
        [("u", d) for d in [1, 2, 3, 7, 9, 10]] + [("v", 5)],
        "k string, day long",
    )
    got = {(r.k, r.island_start, r.island_end, r.island_len)
           for r in islands(df, "k", "day").collect()}
    assert got == {("u", 1, 3, 3), ("u", 7, 7, 1), ("u", 9, 10, 2), ("v", 5, 5, 1)}


def test_weighted_sample_prefers_heavy_keys(spark):
    from prosnet_prefect_pipelines_spark.operators.sampling import weighted_sample_topk

    # two tiers: weight 1000 vs weight 1 — the heavy tier should dominate
    rows = [(i, 1000 if i < 50 else 1) for i in range(1050)]
    df = spark.createDataFrame(rows, "id long, w long")
    kept = [r.id for r in weighted_sample_topk(df, "id", "w", k=40).collect()]
    assert len(kept) == 40 and len(set(kept)) == 40
    heavy = sum(1 for i in kept if i < 50)
    assert heavy >= 30  # ~weight-proportional inclusion
    # determinism: identical on rerun
    again = [r.id for r in weighted_sample_topk(df, "id", "w", k=40).collect()]
    assert kept == again


def test_interval_overlap_matches_bruteforce(spark):
    from prosnet_prefect_pipelines_spark.operators.temporal import interval_overlap_join

    import random

    rnd = random.Random(3)
    a = [(i, rnd.randrange(0, 200)) for i in range(60)]
    b = [(i, rnd.randrange(0, 200)) for i in range(60)]
    A = [(k, lo, lo + rnd.randrange(0, 12)) for k, lo in a]
    B = [(k, lo, lo + rnd.randrange(0, 12)) for k, lo in b]
    la = spark.createDataFrame(A, "a_key long, a_lo long, a_hi long")
    lb = spark.createDataFrame(B, "b_key long, b_lo long, b_hi long")
    got = {(r.a_key, r.b_key) for r in
           interval_overlap_join(la, lb, "a_lo", "a_hi", "b_lo", "b_hi", 5).collect()}
    expect = {(ka, kb) for ka, lo1, hi1 in A for kb, lo2, hi2 in B
              if lo1 <= hi2 and lo2 <= hi1}
    assert got == expect


def test_feature_hashing_shape_and_determinism(spark):
    from prosnet_prefect_pipelines_spark.operators.textstats import feature_hashing

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b"), (3, "")], "id long, text string"
    )
    out = feature_hashing(df, "id", "text", n_buckets=16)
    rows = out.collect()
    assert all(0 <= r.bucket < 16 for r in rows)
    # doc 3 has no tokens -> no rows
    assert {r.id for r in rows} == {1, 2}
    # same token always lands in the same signed bucket: doc1 'a' appears
    # twice -> its bucket magnitude for 'a'-only bucket is 2 (if isolated)
    again = {(r.id, r.bucket, r.val) for r in
             feature_hashing(df, "id", "text", n_buckets=16).collect()}
    assert {(r.id, r.bucket, r.val) for r in rows} == again
