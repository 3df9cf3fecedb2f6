"""ANN-LSH stress: candidate-pair growth vs corpus size.

Generates a deterministic synthetic embedding corpus (hash-derived
vectors, no files needed), runs the auto-scaled RHP-LSH bucketing at
increasing N, and reports candidate-pair counts vs the all-pairs
quadratic — the evidence that bucket count growing with log2(N) keeps
candidate generation ~linear. Reproduce: python scripts/stress_ann.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def vectors(spark, n: int, dim: int):
    """Deterministic pseudo-random unit-ish vectors: component d of id i
    = (xxhash64(i, d) mod 2001)/1000 - 1 in [-1, 1]."""
    return spark.range(n).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) / 1000.0 - 1.0
            ).cast("float"),
        ).alias("v"),
    )


def main() -> None:
    from prosnet_prefect_pipelines_spark.operators.similarity import (
        auto_planes,
        rhp_signature,
    )
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_ann")
    dim, tables = 64, 2
    for n in (2_000, 20_000, 100_000):
        t0 = time.time()
        planes = auto_planes(n, target_bucket=64)
        vecs = vectors(spark, n, dim)
        sig = vecs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.concat(
                            F.lit(f"{t}:"),
                            rhp_signature(F.col("v"), dim, planes, offset=t * planes),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("bucket"),
        ).localCheckpoint(eager=False)
        sizes = sig.groupBy("bucket").agg(F.count("*").alias("c"))
        stats = sizes.agg(
            F.count("*").alias("buckets"),
            F.max("c").alias("max_bucket"),
            # within-bucket pair count = sum c*(c-1)/2 across tables
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
        ).collect()[0]
        all_pairs = n * (n - 1) / 2
        print(
            f"n={n:>7} planes={planes:>2} tables={tables} "
            f"buckets={stats.buckets:>6} max_bucket={stats.max_bucket:>5} "
            f"cand_pairs={int(stats.pairs):>10} "
            f"({100 * stats.pairs / all_pairs:.2f}% of n^2/2) "
            f"[{time.time() - t0:.1f}s]"
        )


if __name__ == "__main__":
    main()
