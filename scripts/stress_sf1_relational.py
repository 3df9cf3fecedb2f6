"""Synthetic sf1 relational stress (r8 verdict gap 2): the TPC-H-ish
relational headliners had micro-stress coverage (1M docs / 2M edges /
100M ANN candidates) but were never RUN above sf0.1 (~600k lineitem).
This script measures them at a 10x synthetic scale-up so the "designed
for 100 TB" claim rests on measurement, not plan inspection alone.

Scale-up construction: each fact/dim table is replicated REPLICAS
times with every key column shifted by replica * KEY_STRIDE — join
relationships hold within a replica and never cross replicas, so the
scaled corpus behaves like a 10x-larger instance of the same
distribution (TPC-H's own scaling keeps dimension enums fixed the same
way: nation/region/flags stay 25/5/enum-sized while entity tables
grow). nation/region/events/documents/embeddings are symlinked
unscaled — they are the bounded dimensions (or out of relational
scope) at every sf.

Outputs one JSON artifact: per-query cold/warm wall at the base sf and
at the scaled sf, rows, and the scale ratio (warm-to-warm where both
sides have it). A query whose warm ratio grossly exceeds the data
ratio (10x) on a fixed-core host is flagged `superlinear` for the
round report.

Usage: python scripts/stress_sf1_relational.py [base_sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000  # far above any sf0.1 key value
SCALED_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
UNSCALED = ["region", "nation", "events", "documents", "embeddings"]

QUERIES = [
    "sql_tpch_q1",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "sql_tpch_q8",
    "sql_tpch_q9",
    "sql_tpch_q18",
    "sql_tpch_q21",
    "pricing_summary",
    "fifo_allocation",
    "city_index_docs",
]


def build_scaled_dir(spark, base: str, replicas: int) -> str:
    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )
    from pyspark.sql import functions as F

    out = private_stage_dir(
        f"sf1_relational_{os.path.basename(base.rstrip('/'))}_x{replicas}"
    )
    done_marker = os.path.join(out, "_DONE")
    if os.path.exists(done_marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias(
        "_rep"
    )
    for table, keys in SCALED_KEYS.items():
        df = spark.read.parquet(f"{base}/{table}.parquet").select("*", reps)
        for k in keys:
            df = df.withColumn(
                k, (F.col(k) + F.col("_rep") * KEY_STRIDE).cast("long")
            )
        # one narrow explode pass, re-spread for downstream parallelism
        df.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    for table in UNSCALED:
        src = f"{base}/{table}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out}/{table}.parquet")
    open(done_marker, "w").close()
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    spark = get_spark("stress_sf1")
    qs = entry_mod.queries()
    spark.range(1).count()  # JVM warm-up

    t0 = time.time()
    scaled = build_scaled_dir(spark, base, replicas)
    build_s = round(time.time() - t0, 1)
    print(f"# scaled dir {scaled} ready in {build_s}s", file=sys.stderr)

    def timed(name: str, sf_dir: str) -> tuple[float, int]:
        sweep_persistent_rdds(spark)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        return round(time.time() - t0, 3), n

    results = {}
    for name in QUERIES:
        if name not in qs:
            continue
        base_cold, base_rows = timed(name, base)
        base_warm, _ = timed(name, base)
        big_cold, big_rows = timed(name, scaled)
        big_warm, _ = timed(name, scaled)
        ratio = round(big_warm / base_warm, 2) if base_warm else None
        results[name] = {
            "base_cold_s": base_cold,
            "base_warm_s": base_warm,
            "base_rows": base_rows,
            "scaled_cold_s": big_cold,
            "scaled_warm_s": big_warm,
            "scaled_rows": big_rows,
            "warm_scale_ratio": ratio,
            # 10x data on fixed cores: linear scaling = ratio ~10. The
            # flag fires at 2x over linear — superlinear growth is the
            # scale-killer signature (quadratic pair stages, skew).
            "superlinear": bool(ratio and ratio > 2 * replicas),
        }
        print(
            f"# {name}: base {base_warm}s -> x{replicas} {big_warm}s "
            f"(ratio {ratio}, rows {base_rows} -> {big_rows})",
            file=sys.stderr,
        )

    artifact = {
        "base_sf_dir": base,
        "replicas": replicas,
        "key_stride": KEY_STRIDE,
        "build_s": build_s,
        "queries": results,
        "n_superlinear": sum(1 for r in results.values() if r["superlinear"]),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "artifacts", "stress_sf1_relational.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"artifact": out_path, **{k: v["warm_scale_ratio"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
