"""Stress runs for the round-2 operators at synthetic scale — the
numbers behind SCALE.md's measured entries for batches 11-19.

Usage: python scripts/stress_r2.py [rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    mil = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(mil * 1_000_000)

    from prosnet_prefect_pipelines_spark.operators.graph import (
        scc_components,
        temporal_reachability,
    )
    from prosnet_prefect_pipelines_spark.operators.relational import salted_join
    from prosnet_prefect_pipelines_spark.operators.sampling import weighted_sample_topk
    from prosnet_prefect_pipelines_spark.operators.temporal import interval_overlap_join
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_r2")
    spark.range(1).count()  # warm

    # --- salted join under extreme skew: 80% of n rows on ONE key --------
    fact = spark.range(n, numPartitions=32).select(
        F.when(F.col("id") % 5 > 0, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    t0 = time.time()
    r = (
        salted_join(fact, dim, on="k", salt=32)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    t_salted = time.time() - t0
    print(f"salted_join: {n:,} rows, 80% one key, salt=32 -> {r:,} joined in {t_salted:.1f}s")

    # unsalted comparison (AQE skew split only)
    t0 = time.time()
    r2 = (
        fact.join(dim, on="k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    t_plain = time.time() - t0
    assert r == r2
    print(f"  plain join same data: {t_plain:.1f}s (AQE skew handling)")

    # --- weighted sampling over n rows -----------------------------------
    df = spark.range(n, numPartitions=32).select(
        F.col("id"), (F.col("id") % 1000 + 1).alias("w")
    )
    t0 = time.time()
    got = weighted_sample_topk(df, "id", "w", k=1000).count()
    t_ws = time.time() - t0
    assert got == 1000
    print(f"weighted_sample_topk: {n:,} rows -> top-1000 in {t_ws:.1f}s (TakeOrdered)")

    # --- interval overlap: n/10 x n/10 short intervals -------------------
    m = n // 10
    a = spark.range(m, numPartitions=32).select(
        F.col("id").alias("a_key"),
        (F.col("id") % 1_000_000).alias("a_lo"),
        (F.col("id") % 1_000_000 + F.col("id") % 8).alias("a_hi"),
    )
    b = spark.range(m, numPartitions=32).select(
        F.col("id").alias("b_key"),
        ((F.col("id") * 7) % 1_000_000).alias("b_lo"),
        ((F.col("id") * 7) % 1_000_000 + F.col("id") % 6).alias("b_hi"),
    )
    t0 = time.time()
    pairs = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8).count()
    t_io = time.time() - t0
    print(f"interval_overlap_join: {m:,} x {m:,} intervals -> {pairs:,} pairs in {t_io:.1f}s")

    # --- distributed SCC: 100k-node cyclic block graph -------------------
    nodes = 100_000
    blk = 10
    ks = spark.range(nodes, numPartitions=16).select(F.col("id").alias("v"))
    cyc = ks.select(
        F.col("v").alias("src"),
        (F.col("v") - (F.col("v") % blk) + ((F.col("v") % blk) + 1) % blk).alias("dst"),
    )
    # doubling cross edges keep the coloring diameter logarithmic
    chain = ks.filter((F.col("v") % blk == 0) & (F.col("v") * 2 + blk < nodes)).select(
        F.col("v").alias("src"), (F.col("v") * 2 + blk).alias("dst")
    )
    edges = cyc.unionByName(chain)
    t0 = time.time()
    sccs = scc_components(edges, driver_threshold=0).groupBy("scc").count().count()
    t_scc = time.time() - t0
    print(f"scc_components (distributed): {nodes:,} nodes -> {sccs:,} SCCs in {t_scc:.1f}s")

    # --- distributed temporal reachability over n/10 timestamped edges ---
    m = n // 10
    te = spark.range(m, numPartitions=32).select(
        (F.col("id") % 50_000).alias("src"),
        ((F.col("id") * 13 + 7) % 50_000).alias("dst"),
        (F.col("id") % 10_000).alias("t"),
    ).filter(F.col("src") != F.col("dst"))
    t0 = time.time()
    reached = temporal_reachability(te, [0], driver_threshold=0).count()
    t_tr = time.time() - t0
    print(f"temporal_reachability (distributed): {m:,} edges -> {reached:,} reached in {t_tr:.1f}s")


if __name__ == "__main__":
    main()
