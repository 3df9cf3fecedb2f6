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
