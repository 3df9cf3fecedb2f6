"""Stress runs for the r2 pipeline operators at synthetic scale —
the numbers behind SCALE.md's 'Measured on this box' entries.

Usage: python scripts/stress_pipeline.py [rows_millions]
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

    from prosnet_prefect_pipelines_spark.operators import sketch as SK
    from prosnet_prefect_pipelines_spark.operators.audit import (
        content_checksum,
        snapshot_diff,
    )
    from prosnet_prefect_pipelines_spark.operators.graph import triangle_count
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_pipeline")
    spark.range(1).count()  # warm

    # --- content checksum over n rows, 32 groups -------------------------
    df = spark.range(n, numPartitions=32).select(
        (F.col("id") % 32).alias("g"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("t"),
    )
    t0 = time.time()
    got = content_checksum(df, ["g"], ["t"]).collect()
    t_checksum = time.time() - t0
    assert len(got) == 32
    print(f"content_checksum: {n:,} rows, 32 groups in {t_checksum:.1f}s")

    # --- snapshot diff: n-row snapshots, 1% changed/added/removed --------
    old = spark.range(n, numPartitions=32).filter(F.col("id") % 100 != 3).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    new = spark.range(n, numPartitions=32).filter(F.col("id") % 101 != 5).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 100 == 7, F.col("id") * 7 + 1)
        .otherwise(F.col("id") * 7)
        .alias("v"),
    )
    t0 = time.time()
    counts = (
        snapshot_diff(old, new, ["k"], ["v"])
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    t_diff = time.time() - t0
    print(
        f"snapshot_diff: 2 x {n:,}-row snapshots -> "
        f"{ {r.status: r.n for r in counts} } in {t_diff:.1f}s"
    )

    # --- HLL distinct vs exact on n keys, 8 groups -----------------------
    keys = spark.range(n, numPartitions=32).select(
        (F.col("id") % 8).alias("g"), (F.col("id") % (n // 2)).alias("k")
    )
    t0 = time.time()
    hll = {r.g: r.hll_estimate for r in SK.hll_distinct(keys, ["g"], "k").collect()}
    t_hll = time.time() - t0
    t0 = time.time()
    exact = {
        r.g: r.n
        for r in keys.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    t_exact = time.time() - t0
    worst = max(abs(hll[g] - exact[g]) / exact[g] for g in exact)
    print(
        f"hll_distinct: {n:,} rows, 8 groups in {t_hll:.1f}s "
        f"(exact countDistinct {t_exact:.1f}s); worst rel err {worst:.3f}"
    )

    # --- triangles on a ~n/10-edge constant-degree graph -----------------
    m1, m2 = n // 100 + 1, n // 100 + 3
    edges = spark.range(n // 10, numPartitions=32).select(
        (F.col("id") % m1).alias("src"), (F.col("id") % m2).alias("dst")
    )
    t0 = time.time()
    tri = triangle_count(edges).collect()[0].triangles
    t_tri = time.time() - t0
    print(f"triangle_count: {n // 10:,} edges -> {tri:,} triangles in {t_tri:.1f}s")


if __name__ == "__main__" and not os.environ.get("STRESS_B10"):
    main()


def stress_batch10() -> None:
    """Fuzzy join + k-core at synthetic scale (SCALE.md entries)."""
    import time

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators.graph import kcore_peel
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_b10")
    spark.range(1).count()

    n = 1_000_000
    # edit-distance<=1 join: 1M 9-char keys vs 1M perturbed twins
    base = spark.range(n, numPartitions=32).select(
        F.col("id"), F.lpad(F.col("id").cast("string"), 9, "0").alias("key")
    )
    dirty = base.select(
        (F.col("id") + 10_000_000).alias("id"),
        F.when(
            F.col("id") % 3 == 0,
            F.expr("substr(key, 1, 4) || substr(key, 6)"),
        )
        .when(F.col("id") % 3 == 1, F.expr("substr(key, 1, 6) || 'X' || substr(key, 8)"))
        .otherwise(F.col("key"))
        .alias("key"),
    )

    def variants(df, idc):
        pos = F.explode(F.sequence(F.lit(0), F.length("key"))).alias("p")
        return df.select(F.col("id").alias(idc), "key", pos).select(
            idc,
            F.col("key").alias(f"{idc}_key"),
            F.when(F.col("p") == 0, F.col("key"))
            .otherwise(F.concat(F.expr("substr(key, 1, p - 1)"), F.expr("substr(key, p + 1)")))
            .alias("variant"),
        )

    t0 = time.time()
    cand = (
        variants(base, "a")
        .join(variants(dirty, "b"), on="variant")
        .select("a", "b", "a_key", "b_key")
        .distinct()
    )
    matched = cand.filter(F.levenshtein("a_key", "b_key") <= 1).count()
    print(f"fuzzy_join_ed1: 2 x {n:,} keys -> {matched:,} matches in {time.time()-t0:.1f}s")

    # k-core on a 2M-edge constant-degree graph
    m1, m2 = n // 10 + 1, n // 10 + 3
    edges = spark.range(2 * n, numPartitions=32).select(
        (F.col("id") % m1).alias("src"), (F.col("id") % m2).alias("dst")
    )
    t0 = time.time()
    core = kcore_peel(edges, k=8, rounds=6).count()
    print(f"kcore_peel: {2*n:,} edges, k=8 -> {core:,} core nodes in {time.time()-t0:.1f}s")


if __name__ == "__main__" and os.environ.get("STRESS_B10"):
    stress_batch10()
