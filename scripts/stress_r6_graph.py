"""r6 stress: the closure/fixpoint graph operators at a TRUE 100x edge
scale — the r5 verdict asked that the J5/J9 100 TB story rest on a
measured point, not extrapolation from r3's 2-9M-edge runs.

Cases (all far above the 500k driver threshold — distributed paths):

1. ``connected_components`` on a 101M-edge sameAs-shaped graph:
   100M intra-cluster edges over 25M nodes in 781,250 clusters of 32
   (random wiring inside each cluster — the realistic cross-reference
   shape), PLUS a 1M-node chain (diameter 1e6 — the adversarial case
   that makes label propagation take 1e6 rounds; Kiveris star
   contraction must finish in O(log n)).
2. ``scc_components`` on a 10M-edge directed graph of 100k 100-node
   cycles linked by forward DAG edges (1M SCCs): 100x the r2-stressed
   coloring graph's SCC count, 10x its edges.
3. ``transitive_closure`` (frontier) on a 10M-edge forest of depth-8
   binary-ish trees: ~33x r3's 300k-edge tree, output ~36M ancestor
   pairs, rounds bounded by tree depth.

Reports wall time, result cardinalities, and PEAK SHUFFLE (max single
-stage shuffle write + total shuffle write across the run) read from
the JVM AppStatusStore — no UI needed.

Usage: python scripts/stress_r6_graph.py [scale]   # scale default 1.0
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prosnet_prefect_pipelines_spark.operators import graph as G  # noqa: E402
from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402


def shuffle_stats(spark) -> tuple[int, int, int]:
    """(peak_stage_shuffle_write_bytes, total_shuffle_write_bytes,
    n_stages) from the in-process AppStatusStore."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jvm, gw = sc._jvm, sc._gateway
        stages = store.stageList(
            jvm.java.util.ArrayList(),  # all statuses
            False,  # details
            False,  # withSummaries
            gw.new_array(jvm.double, 0),  # unsortedQuantiles
            jvm.java.util.ArrayList(),  # taskStatus
        )
        peak = total = n = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            w = s.shuffleWriteBytes()
            peak = max(peak, w)
            total += w
            n += 1
        return peak, total, n
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"  (shuffle stats unavailable: {exc})")
        return -1, -1, -1


def report(spark, label: str, t0: float, before: tuple[int, int, int]) -> None:
    peak, total, _ = shuffle_stats(spark)
    d_total = total - before[1] if total >= 0 and before[1] >= 0 else -1
    print(
        f"{label}: {time.time() - t0:.1f}s wall, "
        f"peak stage shuffle write {peak / 1e9:.2f} GB, "
        f"shuffle written this case {d_total / 1e9:.2f} GB"
    )


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    spark = get_spark("stress_r6_graph")
    spark.range(1).count()

    # --- case 1: connected components, 101M edges ------------------------
    n_edges = int(100_000_000 * scale)
    n_nodes = int(25_000_000 * scale)
    cluster = 32
    clustered = spark.range(n_edges).select(
        F.concat(F.lit("n"), (F.col("id") % n_nodes).cast("string")).alias("src"),
        F.concat(
            F.lit("n"),
            (
                ((F.col("id") % n_nodes) / cluster).cast("long") * cluster
                # deterministic pseudo-random partner inside the cluster
                + F.abs(F.xxhash64(F.col("id"))) % cluster
            ).cast("string"),
        ).alias("dst"),
    )
    chain_n = int(1_000_000 * scale)
    chain = spark.range(chain_n - 1).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("c"), (F.col("id") + 1).cast("string")).alias("dst"),
    )
    edges = clustered.unionAll(chain)
    before = shuffle_stats(spark)
    t0 = time.time()
    comps = G.connected_components(edges, "src", "dst")
    ncomp = comps.select("comp").distinct().count()
    nnode = comps.count()
    print(f"  components: {ncomp:,} comps over {nnode:,} nodes ({n_edges + chain_n - 1:,} edges)")
    report(spark, f"connected_components {n_edges + chain_n - 1:,} edges", t0, before)

    # --- case 2: SCC coloring, 10M edges, 1M SCCs ------------------------
    n_scc_edges = int(10_000_000 * scale)
    cyc = 10  # cycle length -> 1M SCCs of 10 nodes at scale 1
    n_cyc_nodes = n_scc_edges  # one edge per node in a cycle
    in_cycle = spark.range(n_cyc_nodes).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("src"),
        F.concat(
            F.lit("s"),
            (
                (F.col("id") / cyc).cast("long") * cyc + (F.col("id") + 1) % cyc
            ).cast("string"),
        ).alias("dst"),
    )
    # forward DAG edges arranged as a BINARY TREE over cycles (cycle
    # i -> cycle 2i, 2i+1; never backward, so SCCs stay the cycles).
    # Tree shape keeps the SCC-DAG diameter ~log2(1M) = 20: Orzan's
    # forward/backward fixpoints are O(DAG diameter) rounds, so a
    # chain-shaped DAG would need ~1M iterations by construction —
    # the r2 stress used log-diameter cross edges for the same reason.
    n_cycles = int(n_cyc_nodes / cyc)
    dag = (
        spark.range(1, n_cycles)
        .select(
            F.concat(
                F.lit("s"), ((F.col("id") / 2).cast("long") * cyc).cast("string")
            ).alias("src"),
            F.concat(F.lit("s"), (F.col("id") * cyc).cast("string")).alias("dst"),
        )
    )
    before = shuffle_stats(spark)
    t0 = time.time()
    sccs = G.scc_components(in_cycle.unionAll(dag), "src", "dst", max_iterations=200)
    nscc = sccs.select("scc").distinct().count()
    print(f"  scc: {nscc:,} SCCs over {sccs.count():,} nodes")
    report(spark, f"scc_components {n_cyc_nodes + int(n_cyc_nodes / cyc) - 1:,} edges", t0, before)

    # --- case 3: frontier closure, 10M-edge depth-8 forest ---------------
    n_tree_edges = int(10_000_000 * scale)
    # forest of complete binary trees of 255 nodes (depth 8): node i's
    # parent is i/2 within its tree block
    tree = (
        spark.range(n_tree_edges)
        .select(
            (F.col("id") / 255).cast("long").alias("blk"),
            (F.col("id") % 255 + 1).alias("pos"),
        )
        .filter(F.col("pos") >= 2)
        .select(
            F.concat(F.lit("t"), (F.col("blk") * 255 + F.col("pos")).cast("string")).alias("src"),
            F.concat(
                F.lit("t"), (F.col("blk") * 255 + (F.col("pos") / 2).cast("long")).cast("string")
            ).alias("dst"),
        )
    )
    before = shuffle_stats(spark)
    t0 = time.time()
    clo = G.transitive_closure(tree, driver_threshold=0, method="frontier")
    npairs = clo.count()
    print(f"  closure: {npairs:,} ancestor pairs from ~{n_tree_edges:,} tree edges")
    report(spark, f"transitive_closure {n_tree_edges:,}-edge forest", t0, before)


if __name__ == "__main__":
    main()
