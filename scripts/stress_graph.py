"""Stress the DISTRIBUTED graph paths above the adaptive threshold —
reproduces the 'Measured on this box' numbers in SCALE.md.

Usage: python scripts/stress_graph.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prosnet_prefect_pipelines_spark.operators import graph as G  # noqa: E402
from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("stress_graph")
    spark.range(1).count()

    # 2M-edge graph over 1M nodes collapsing into ONE component
    # (worst case: maximum contraction rounds)
    n = 2_000_000
    base = spark.range(n).select(
        F.concat(F.lit("n"), (F.col("id") % 1_000_000).cast("string")).alias("src"),
        F.concat(
            F.lit("n"), ((F.col("id") % 1_000_000) + (F.col("id") % 17 + 1)).cast("string")
        ).alias("dst"),
    )
    t0 = time.time()
    comps = G.connected_components(base, "src", "dst")  # 2M raw > threshold
    ncomp = comps.select("comp").distinct().count()
    print(
        f"components (distributed, 2M edges): {ncomp} comps, "
        f"{comps.count()} nodes in {time.time() - t0:.1f}s"
    )

    # deep-ontology reachability: 300k-edge halving tree, 65k-node subtree
    tree = spark.range(2, 300_000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("c"), (F.col("id") / 2).cast("long").cast("string")).alias("dst"),
    )
    t0 = time.time()
    sub = G.descendants(tree, ["c7"], driver_threshold=0)
    print(
        f"descendants (distributed, 300k edges): subtree={sub.count()} "
        f"in {time.time() - t0:.1f}s"
    )

    # full all-pairs closure of the 300k-edge tree (~4.9M pairs, 17 rounds)
    for method in ("frontier", "doubling"):
        t0 = time.time()
        clo = G.transitive_closure(tree, driver_threshold=0, method=method)
        print(
            f"closure (distributed, {method}): {clo.count()} pairs "
            f"in {time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
