"""Streaming preference monitor at synthetic scale (r10, batch 117).

The production shape the catalog's documents-table stand-in cannot show:
one roster per PROMPT — a corpus-scaled count of tiny (fan-out-bounded)
groups. 100k prompt groups x 12 candidates arrive in 4 micro-batches
sliced ACROSS groups (every batch touches every group with ~3 new
candidates — the worst case for roster churn), so a per-group state key
would pay 100k pandas/Arrow round-trips per batch; the shard supergroup
(q_pipeline117._N_SHARDS) amortizes that to n_shards calls with a
vectorized per-group closed-form recompute inside. Measures per-batch
wall (flat = delta-proportional) and checks the final last-write-wins
stats EXACTLY equal the batch closed form over all candidates.

Usage: python scripts/stress_preference.py [n_groups] [per_group] [n_shards]
       # defaults 100,000 groups, 12 candidates each, q_pipeline117 default shards
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import prosnet_prefect_pipelines_spark.plans.q_pipeline117 as P117  # noqa: E402
from prosnet_prefect_pipelines_spark.plans.q_pipeline116 import (  # noqa: E402
    _MAX_REJECTED,
    _MIN_MARGIN,
)
from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402


def synth_scored(spark, n_groups: int, per_group: int):
    """(lang, source, doc_id, reward, n_chars): deterministic hashed
    rewards; group = (lang, source) with source unique per group."""
    n = n_groups * per_group
    return spark.range(n).select(
        F.concat(F.lit("l"), (F.expr(f"id div {per_group}") % 64).cast("string")).alias("lang"),
        F.concat(F.lit("s"), F.expr(f"id div {per_group}").cast("string")).alias("source"),
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("long").alias("reward"),
        (F.lit(100) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(900))).cast("long").alias("n_chars"),
    )


def main() -> None:
    n_groups = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if len(sys.argv) > 3:
        P117._N_SHARDS = int(sys.argv[3])
    spark = get_spark("stress_preference")
    scored = synth_scored(spark, n_groups, per_group)

    stage = tempfile.mkdtemp(prefix="pref_stress_stage_")
    out = tempfile.mkdtemp(prefix="pref_stress_out_")
    ckpt = tempfile.mkdtemp(prefix="pref_stress_ckpt_")
    # slice ACROSS groups: batch b carries candidates doc_id % 4 == b,
    # so every batch touches (almost) every group
    for b in range(4):
        scored.filter(F.col("doc_id") % 4 == b).coalesce(8).write.parquet(
            os.path.join(stage, f"b{b}"), mode="overwrite"
        )
    import glob as _glob

    flat = tempfile.mkdtemp(prefix="pref_stress_flat_")
    for b in range(4):
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(stage, f"b{b}", "part-*.parquet")))
        ):
            os.replace(part, os.path.join(flat, f"b{b}_{i:02d}.parquet"))
        time.sleep(1.1)
        now = time.time()
        for f in os.listdir(flat):
            if f.startswith(f"b{b}_"):
                os.utime(os.path.join(flat, f), (now, now))
    shutil.rmtree(stage, ignore_errors=True)

    schema = spark.read.parquet(flat).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(flat)
        .withColumn(
            "_skey",
            F.pmod(F.xxhash64("lang", "source"), F.lit(P117._N_SHARDS)),
        )
    )
    batch_times: list[float] = []

    def _sink(bdf, bid):
        t = time.time()
        bdf.write.mode("append").parquet(out)
        batch_times.append(time.time() - t)
        print(f"batch {bid}: {time.time() - t:.1f}s", flush=True)

    t0 = time.time()
    q = (
        src.groupBy("_skey")
        .applyInPandasWithState(
            P117._group_stats,
            outputStructType=P117._OUT_SCHEMA,
            stateStructType=P117._STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(2400), "preference stress replay timed out"
    wall = time.time() - t0
    print(
        f"{n_groups:,} prompt groups x {per_group} candidates in 4 batches: "
        f"{wall:.1f}s total, per-batch {[round(b,1) for b in batch_times]} "
        f"({P117._N_SHARDS} shards)",
        flush=True,
    )

    # exactness: final last-write-wins == batch closed form over all docs
    sink = spark.read.schema(P117._OUT_SCHEMA).parquet(out)
    w = Window.partitionBy("lang", "source").orderBy(F.col("seq").desc())
    final = (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("n_pairs") > 0))
        .select("lang", "source", "n_pairs", "min_margin", "max_margin",
                "sum_margin", "n_chosen_longer", "sum_len_delta")
    )
    w1 = Window.partitionBy("lang", "source").orderBy(
        F.col("reward").desc(), "doc_id"
    )
    chosen = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select("lang", "source", F.col("doc_id").alias("ch_doc"),
                F.col("reward").alias("ch_reward"),
                F.col("n_chars").alias("ch_len"))
    )
    w2 = Window.partitionBy("lang", "source").orderBy(
        F.col("margin").desc(), "doc_id"
    )
    ref = (
        scored.join(chosen, on=["lang", "source"])
        .filter(F.col("doc_id") != F.col("ch_doc"))
        .withColumn("margin", F.col("ch_reward") - F.col("reward"))
        .filter(F.col("margin") >= _MIN_MARGIN)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= _MAX_REJECTED)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("margin").cast("long").alias("min_margin"),
            F.max("margin").cast("long").alias("max_margin"),
            F.sum("margin").cast("long").alias("sum_margin"),
            F.sum(
                F.when(F.col("n_chars") < F.col("ch_len"), 1).otherwise(0)
            ).cast("long").alias("n_chosen_longer"),
            F.sum(F.col("ch_len") - F.col("n_chars")).cast("long").alias(
                "sum_len_delta"
            ),
        )
    )
    d1 = final.exceptAll(ref).count()
    d2 = ref.exceptAll(final).count()
    n_final = final.count()
    print(
        f"equivalence vs batch closed form: {n_final:,} group rows, "
        f"diff {d1}+{d2} (0+0 = exact)",
        flush=True,
    )
    for p in (out, ckpt, flat):
        shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
