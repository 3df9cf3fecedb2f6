"""Stress the r2 ranking/dedup tiers at synthetic scale — reproduces the
'Measured on this box' numbers in SCALE.md.

- PageRank: 2M-edge power-law-ish graph over 100k nodes, 10 iterations.
- SemDeDup: 100k synthetic 16-dim vectors, n_cells scaled to keep cells
  ~500 vectors (the paper's lever) — candidate pairs must stay far below
  all-pairs.

Usage: python scripts/stress_ranking.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402


def stress_pagerank(spark) -> None:
    from prosnet_prefect_pipelines_spark.operators.ranking import pagerank

    n_edges, n_nodes = 2_000_000, 100_000
    edges = spark.range(n_edges).select(
        # src skewed by squaring a hash fraction -> hub-heavy out-degree
        ((F.col("id") * 2654435761) % n_nodes).alias("src"),
        ((F.col("id") * 40503 + 7) % n_nodes).alias("dst"),
    )
    t0 = time.time()
    pr = pagerank(edges, iterations=10)
    n = pr.count()
    mass = pr.agg(F.sum("rank_scaled")).first()[0]
    print(
        f"pagerank: {n_edges} edges, {n} ranked nodes, 10 iters in "
        f"{time.time() - t0:.1f}s; total mass {mass / 1e12:.4f} (<= 1 by damping)"
    )


def stress_semdedup(spark) -> None:
    from prosnet_prefect_pipelines_spark.operators.dedup import semdedup

    n, dim = 100_000, 16
    target_cell = 500
    n_cells = max(4, n // target_cell)
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            # a REAL per-(id, dim) hash mix: linear-mod formulas make
            # every vector a shifted ramp (pairwise cos ~1, the whole
            # corpus collapses to one survivor per cell)
            lambda i: ((F.xxhash64(F.col("id"), i) % 20001) / 20001.0),
        ).cast("array<float>").alias("embedding"),
    )
    t0 = time.time()
    out = semdedup(vecs, "vec_id", "embedding", n_cells=n_cells, iterations=1, threshold=0.9)
    kept = out.filter(F.col("kept") == 1).count()
    cell_sizes = out.groupBy("cell").count()
    mx = cell_sizes.agg(F.max("count")).first()[0]
    print(
        f"semdedup: n={n}, n_cells={n_cells}, kept={kept}, "
        f"max cell={mx} (target {target_cell}) in {time.time() - t0:.1f}s"
    )


def main() -> None:
    spark = get_spark("stress_ranking")
    spark.range(1).count()
    stress_pagerank(spark)
    stress_semdedup(spark)


if __name__ == "__main__":
    main()
