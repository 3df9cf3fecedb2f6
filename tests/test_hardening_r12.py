"""Round-12 optimization internals pinned.

1. ``graph.descendants`` below the driver threshold probes AND fetches
   the edge list with ONE limit-collect job (previously a full count()
   job followed by a collect() job — two scans of the edge subquery);
2. ``city_index_docs``' P279 subtree and scalar-builder Column trees
   are memoized per (app_id, sf_dir): once warm, constructing the
   DataFrame schedules no BFS/scan jobs (same probe protocol as
   distrank's job-free construction test).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_descendants_driver_path_is_single_job(spark):
    from prosnet_prefect_pipelines_spark.operators import graph as G

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "x")], "src string, dst string"
    )
    sc = spark.sparkContext
    group = "descendants-single-job-probe"
    sc.setJobGroup(group, "one limit-collect only")
    try:
        out = G.descendants(edges, ["a"], reflexive=True)
        ids = list(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    # CollectLimit's executeTake scans partitions incrementally
    # (1, then 4x more, ...), so the single limit-collect may submit up
    # to ~3 partial-scan jobs whose UNION is at most one full scan —
    # strictly less work than the old full count() + full collect()
    # (measured 0.22-0.43 s -> 0.12-0.17 s on the sf0.1 edge list).
    assert len(ids) <= 3, f"expected <=3 partial-scan jobs, got {len(ids)}"
    assert {r.node for r in out.collect()} == {"a", "b", "c"}


def test_descendants_bfs_result_unchanged_vs_distributed(spark):
    """The limit-collect fold must not change the reachability set:
    force the distributed fixpoint with driver_threshold=0 and compare."""
    from prosnet_prefect_pipelines_spark.operators import graph as G

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("e", "x"), ("x", "a")],
        "src string, dst string",
    )
    fast = {r.node for r in G.descendants(edges, ["a"], reflexive=True).collect()}
    slow = {
        r.node
        for r in G.descendants(
            edges, ["a"], reflexive=True, driver_threshold=0
        ).collect()
    }
    assert fast == slow == {"a", "b", "c", "d", "e", "x"}
    # non-reflexive drops the root on both paths
    fast_nr = {
        r.node for r in G.descendants(edges, ["a"], reflexive=False).collect()
    }
    assert fast_nr == {"b", "c", "d", "e", "x"}


def test_city_index_construction_job_free_after_memo(spark, monkeypatch):
    from prosnet_prefect_pipelines_spark.plans.q_index import q_city_index_docs

    q_city_index_docs(spark, SF)  # warms the subtree + column memos
    sc = spark.sparkContext
    group = "city-index-construction-probe"
    sc.setJobGroup(group, "construction must be scan-free")
    try:
        df = q_city_index_docs(spark, SF)
        ids = list(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    st = sc.statusTracker()
    for jid in ids:
        info = st.getJobInfo(jid)
        for sid in info.stageIds:
            si = st.getStageInfo(sid)
            assert si is None or (si.numTasks <= 1 and "parquet" in si.name), (
                f"construction scheduled a job: {si.name} ({si.numTasks} "
                "tasks) — subtree/column memos must keep plan builds free "
                "of the BFS collect"
            )
    assert df.count() > 0


def test_argmax_row_matches_window_on_null_nan_ties(spark):
    """Pin the r12 argmax rewrite (VERDICT r11 item 5): _argmax_row must
    pick exactly the row row_number() OVER (ORDER BY score DESC, tie
    ASC) = 1 keeps, for every degenerate ordering case across Spark's
    total double order — NULL scores (zero-norm cosines), NaN scores,
    +/-Inf, exact ties broken by tie id, and all-NULL groups."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.operators.similarity import _argmax_row

    nan, inf = float("nan"), float("inf")
    rows = []
    # group 1: plain max           # group 2: tie -> lowest tie id wins
    rows += [(1, 10, 0.5, "a"), (1, 11, 0.9, "b"), (1, 12, 0.7, "c")]
    rows += [(2, 20, 0.4, "d"), (2, 21, 0.4, "e"), (2, 22, 0.1, "f")]
    # group 3: NULL sorts last under DESC -> non-null wins
    rows += [(3, 30, None, "g"), (3, 31, 0.0, "h")]
    # group 4: all NULL -> lowest tie id wins
    rows += [(4, 40, None, "i"), (4, 41, None, "j")]
    # group 5: NaN > +Inf in Spark's total order -> NaN wins
    rows += [(5, 50, inf, "k"), (5, 51, nan, "l"), (5, 52, 1.0, "m")]
    # group 6: -Inf beats NULL
    rows += [(6, 60, -inf, "n"), (6, 61, None, "o")]
    # group 7: NaN ties -> lowest tie id
    rows += [(7, 70, nan, "p"), (7, 71, nan, "q")]
    df = spark.createDataFrame(
        rows, "g int, cid long, score double, payload string"
    )

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("cid"))
    want = {
        (r.g, r.cid, r.payload)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    got = {
        (r.g, r.cid, r.payload)
        for r in _argmax_row(
            df, group=["g"], score="score", tie="cid", keep=["payload"]
        ).collect()
    }
    assert got == want
    assert len(got) == 7


def test_jaccard_verify_set_cap_branch_equality(spark):
    """VERDICT r11 item 6: ids whose shingle set exceeds max_set_size
    take the expansion-join branch instead of materializing a giant
    collect_list row. Both branches (and the all-expansion degenerate)
    must emit the identical (a, b, jaccard) rows, pinned against a
    brute-force set-Jaccard twin on a fixture with a 100x outlier."""
    import random

    from prosnet_prefect_pipelines_spark.operators import dedup as D

    random.seed(7)
    vocab = [f"tok{i}" for i in range(200)]
    rows = [
        (i, " ".join(random.choices(vocab, k=40))) for i in range(12)
    ]
    # 100x outlier: shares vocabulary with the normal docs plus a
    # unique tail so its set is huge but intersections are non-trivial
    rows.append(
        (
            999,
            " ".join(
                random.choices(vocab, k=2000)
                + [f"uniq{j}" for j in range(2000)]
            ),
        )
    )
    docs = spark.createDataFrame(rows, "id long, text string")
    sh = D.shingle_table(docs, "id", "text", k=3)
    cands = spark.createDataFrame(
        [(i, 999) for i in range(12)]
        + [(i, j) for i in range(6) for j in range(i + 1, 6)],
        "a long, b long",
    )

    def run(cap):
        return sorted(
            (r.a, r.b, r.jaccard)
            for r in D.jaccard_verify(
                cands, sh, 0.0, max_set_size=cap
            ).collect()
        )

    array_only = run(10**9)  # nothing capped: pure array branch
    mixed = run(200)  # outlier capped: both branches active
    expansion_only = run(0)  # everything capped: pure expansion branch
    assert array_only == mixed == expansion_only

    sets: dict[int, set] = {}
    for r in sh.collect():
        sets.setdefault(r.id, set()).add(r.shingle)
    brute = sorted(
        (
            r.a,
            r.b,
            len(sets[r.a] & sets[r.b])
            / (len(sets[r.a] | sets[r.b])),
        )
        for r in cands.collect()
        if r.a in sets and r.b in sets
    )
    assert len(brute) == len(array_only)
    for (xa, xb, xj), (ya, yb, yj) in zip(brute, array_only):
        assert (xa, xb) == (ya, yb) and abs(xj - yj) < 1e-6


def test_jaccard_verify_threshold_filter_both_branches(spark):
    """The >= threshold filter must behave identically in the array and
    expansion branches (including dropping zero-intersection pairs)."""
    from prosnet_prefect_pipelines_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),
            (2, "aa bb cc dd ee gg"),
            (3, "zz yy xx ww vv uu"),
        ],
        "id long, text string",
    )
    sh = D.shingle_table(docs, "id", "text", k=3)
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "a long, b long"
    )
    for cap in (10**9, 0):
        got = {
            (r.a, r.b): r.jaccard
            for r in D.jaccard_verify(
                cands, sh, 0.3, max_set_size=cap
            ).collect()
        }
        assert set(got) == {(1, 2)}, got


def test_argmax_array_matches_window_on_null_nan_ties(spark):
    """Pin the r12 carried-array assignment (VERDICT r11 item 7):
    _argmax_array over an array of candidate entries must pick exactly
    the entry row_number() OVER (ORDER BY score DESC, tie ASC) = 1
    keeps, for the same degenerate cases _argmax_row is pinned on —
    array_max compares structs with the identical interpreted total
    order (NULL < -Inf < finite < +Inf < NaN)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.operators.similarity import (
        _argmax_array,
    )

    nan, inf = float("nan"), float("inf")
    rows = []
    rows += [(1, 10, 0.5, "a"), (1, 11, 0.9, "b"), (1, 12, 0.7, "c")]
    rows += [(2, 20, 0.4, "d"), (2, 21, 0.4, "e"), (2, 22, 0.1, "f")]
    rows += [(3, 30, None, "g"), (3, 31, 0.0, "h")]
    rows += [(4, 40, None, "i"), (4, 41, None, "j")]
    rows += [(5, 50, inf, "k"), (5, 51, nan, "l"), (5, 52, 1.0, "m")]
    rows += [(6, 60, -inf, "n"), (6, 61, None, "o")]
    rows += [(7, 70, nan, "p"), (7, 71, nan, "q")]
    df = spark.createDataFrame(
        rows, "g int, cid long, score double, payload string"
    )

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("cid"))
    want = {
        (r.g, r.cid, r.payload)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    # pack each group into one array row, as the trainer's broadcast
    # centroid array does, then per-row argmax over the entries
    packed = df.groupBy("g").agg(
        F.array_sort(
            F.collect_list(F.struct("cid", "score", "payload"))
        ).alias("_entries")
    )
    picked = packed.select(
        "g",
        _argmax_array(F.col("_entries"), lambda e: e["score"]).alias("_am"),
    ).select(
        "g",
        F.col("_am._e.cid").alias("cid"),
        F.col("_am._e.payload").alias("payload"),
    )
    got = {(r.g, r.cid, r.payload) for r in picked.collect()}
    assert got == want
    assert len(got) == 7
