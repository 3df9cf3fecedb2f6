"""Streaming entity resolution at synthetic scale (r7, batch 114).

Measures the claim SCALE.md makes for streaming/resolve.py: per-batch
cost scales with the DELTA, not the accumulated graph. N nodes arranged
in chains of 10 (the entity_resolution corpus shape), edges split into
K arrival batches IN RANDOM ORDER (so most chains straddle batches and
the contraction/merge/relabel path does real work every batch), replayed
through IncrementalResolver; wall time reported per batch plus the final
mapping-vs-batch-components equivalence check.

Usage: python scripts/stress_resolve.py [n_edges] [n_batches]
       # defaults 2,000,000 edges, 4 batches
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prosnet_prefect_pipelines_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402
from prosnet_prefect_pipelines_spark.streaming.resolve import (  # noqa: E402
    IncrementalResolver,
)


def main() -> None:
    n_edges = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("stress_resolve")

    # chain edges: node i -> i-1 except chain heads (i % 10 == 0), as
    # urn strings like the real corpus; random batch assignment
    edges = (
        spark.range(1, n_edges + 1)
        .where(F.col("id") % 10 != 0)
        .select(
            F.concat(F.lit("urn:n/"), F.col("id").cast("string")).alias("src"),
            F.concat(F.lit("urn:n/"), (F.col("id") - 1).cast("string")).alias(
                "dst"
            ),
            F.pmod(F.xxhash64("id"), F.lit(n_batches)).alias("_b"),
        )
        .localCheckpoint()
    )

    r = IncrementalResolver(spark)
    for b in range(n_batches):
        batch = edges.where(F.col("_b") == b).select("src", "dst")
        nb = batch.count()
        t0 = time.time()
        r.update(batch)
        # localCheckpoint inside update() is eager -> wall time is real
        print(
            f"batch {b}: {nb:,} edges folded in {time.time() - t0:.1f}s "
            f"(mapping {r.mapping().count():,} nodes)",
            flush=True,
        )

    t0 = time.time()
    want = connected_components(edges.select("src", "dst"))
    diff = (
        r.mapping().exceptAll(want).count()
        + want.exceptAll(r.mapping()).count()
    )
    print(
        f"equivalence vs single-shot batch components: diff={diff} "
        f"(batch recompute itself took {time.time() - t0:.1f}s)"
    )
    assert diff == 0


if __name__ == "__main__":
    main()
