"""Measure the (nprobe, rerank-pool) grid: recall@3 and serving wall.

r10 verdict item 5: ``pq_rerank_topk`` fixed pool=10; production
servers tune (nprobe, rerank-pool) together, so this script measures
recall@3 on the adversarial i.i.d. corpus (sf0.01, where the published
ppm gauges live) and the serving wall against the memoized batch index
(sf0.1 by default — the serving-cost question) for
pool in {10, 50, 100} x nprobe in {1, 2}.

Writes ONE JSON line per (nprobe, pool) cell; collect with:

    python scripts/sweep_rerank_pool.py > artifacts/sweep_rerank_pool_r13.jsonl

The chosen default is documented in SCALE.md next to the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

RECALL_SF = os.environ.get("SWEEP_RECALL_SF", "/root/testdata/sf0.01")
WALL_SF = os.environ.get("SWEEP_WALL_SF", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators.similarity import (
        cosine_topk,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline10 import (
        _rerank_exact_topk,
    )
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    spark = get_spark("sweep_rerank_pool")
    spark.range(1).count()

    # exact ground truth once per recall corpus
    emb = spark.read.parquet(f"{RECALL_SF}/embeddings.parquet")
    exact = (
        cosine_topk(emb, "vec_id", "embedding", k=3, dim=64)
        .select(F.col("id").alias("qid"), F.col("neighbor").alias("xid"))
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()

    for nprobe in (1, 2):
        for pool in (10, 50, 100):
            approx = _rerank_exact_topk(
                spark, RECALL_SF, nprobe=nprobe, pool=pool
            ).select(F.col("qid").alias("a_qid"), F.col("xid").alias("a_xid"))
            n_hit = (
                exact.join(
                    approx,
                    (exact["qid"] == approx["a_qid"])
                    & (exact["xid"] == approx["a_xid"]),
                    "left",
                )
                .filter(F.col("a_xid").isNotNull())
                .count()
            )
            # serving wall: warm x3 against the memoized index, floor
            # reported (the bench's steady-state estimator); first shot
            # recorded separately (includes the index build at this sf
            # on the first cell only)
            t0 = time.time()
            _rerank_exact_topk(spark, WALL_SF, nprobe=nprobe, pool=pool).count()
            first = round(time.time() - t0, 3)
            walls = []
            for _ in range(3):
                t0 = time.time()
                _rerank_exact_topk(
                    spark, WALL_SF, nprobe=nprobe, pool=pool
                ).count()
                walls.append(round(time.time() - t0, 3))
            print(
                json.dumps(
                    {
                        "nprobe": nprobe,
                        "pool": pool,
                        "recall_sf": RECALL_SF,
                        "n_exact": n_exact,
                        "n_hit": n_hit,
                        "recall_ppm": n_hit * 1_000_000 // n_exact,
                        "wall_sf": WALL_SF,
                        "wall_first_s": first,
                        "wall_warm_s": walls,
                        "wall_warm_min_s": min(walls),
                        "load_avg_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )
    sweep_persistent_rdds(spark)


if __name__ == "__main__":
    main()
