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
