"""Unit tests for batch-22: MST driver/distributed equivalence +
Kruskal verification, skyline correctness vs brute force, window suite,
FK audit."""

from __future__ import annotations

from pyspark.sql import functions as F


def _kruskal(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
            chosen.append((a, b, w))
    return chosen


def test_mst_matches_kruskal_and_paths_agree(spark):
    from prosnet_prefect_pipelines_spark.operators.graph import mst_boruvka

    import random

    rnd = random.Random(9)
    n = 40
    edges = []
    seen_w = set()
    for _ in range(150):
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a == b:
            continue
        w = rnd.randrange(100000)
        if w in seen_w:
            continue
        seen_w.add(w)
        edges.append((a, b, w))
    df = spark.createDataFrame(edges, "src long, dst long, w long")

    expect = {(w) for _, _, w in _kruskal(edges)}
    driver = {r.w for r in mst_boruvka(df).collect()}
    dist = {r.w for r in mst_boruvka(df, driver_threshold=0).collect()}
    # distinct weights -> the forest's weight SET identifies it uniquely
    assert driver == expect
    assert dist == expect


def test_skyline_matches_bruteforce(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline22 import q_skyline_2d

    sf = "/root/testdata/sf0.001"
    got = {(r.s_suppkey) for r in q_skyline_2d(spark, sf).collect()}
    sup = spark.read.parquet(f"{sf}/supplier.parquet").collect()
    pts = [(s.s_suppkey, s.s_suppkey % 701, round(s.s_acctbal * 100)) for s in sup]
    expect = set()
    for k, c, q in pts:
        dominated = any(
            (c2 < c and q2 <= q) or (c2 <= c and q2 < q) for _, c2, q2 in pts
        )
        # tie-exact duplicates: keep the first by (cost, quality, key) order
        if not dominated:
            dup_better = any(
                c2 == c and q2 == q and k2 < k for k2, c2, q2 in pts
            )
            if not dup_better:
                expect.add(k)
    assert got == expect


def test_window_suite_quartiles(spark):
    df = spark.createDataFrame([(i, i % 2, float(i)) for i in range(8)],
                               "c_custkey long, c_nationkey int, c_acctbal double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    out = df.select("c_custkey", F.ntile(4).over(w).alias("q")).collect()
    per = {}
    for r in out:
        per.setdefault(r.q, 0)
        per[r.q] += 1
    assert per == {1: 2, 2: 2, 3: 2, 4: 2}


def test_fk_audit_clean_schema(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline22 import q_fk_integrity_audit

    out = {r.fk: (r.orphans, r.n_child)
           for r in q_fk_integrity_audit(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"lineitem->orders", "orders->customer", "lineitem->part"}
    for orphans, n in out.values():
        assert 0 <= orphans <= n
