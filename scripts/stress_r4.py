"""Stress runs for the batch 32-38 operators at synthetic scale — the
numbers behind SCALE.md's measured entries (winnowing fingerprints,
DSIR scoring, training shuffle, PIT join).

Usage: python scripts/stress_r4.py [rows_millions]
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

    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_r4")
    spark.range(1).count()  # warm

    # --- winnowing selection over n k-gram hashes --------------------------
    # synthetic gram stream: 100k docs x (n/100k) grams, 40-bit hashes
    per_doc = max(n // 100_000, 1)
    grams = spark.range(n, numPartitions=32).select(
        (F.col("id") / per_doc).cast("long").alias("doc_id"),
        (F.col("id") % per_doc + 1).alias("p"),
        F.lit(per_doc).alias("n_grams"),
        (F.xxhash64("id") % 1099511627776).alias("h"),
    ).withColumn("h", F.abs("h"))
    W = 4
    POS = 1 << 20
    t0 = time.time()
    starts = grams.select(
        "doc_id",
        "p",
        "h",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("p") - W + 1),
                F.least(F.col("p"), F.greatest(F.col("n_grams") - W + 1, F.lit(1))),
            )
        ).alias("s"),
    )
    sel = (
        starts.groupBy("doc_id", "s")
        .agg(F.min(F.col("h") * POS + (POS - 1 - F.col("p"))).alias("key"))
        .select("doc_id", F.expr(f"key div {POS}").alias("fp"))
        .distinct()
    )
    n_fps = sel.count()
    t_win = time.time() - t0
    print(
        f"winnowing: {n:,} grams (w=4) -> {n_fps:,} fingerprints "
        f"({n_fps * 100 // n}% density) in {t_win:.1f}s"
    )

    # --- DSIR scoring: broadcast ratio table over n gram features ----------
    B = 1024
    feats = spark.range(n, numPartitions=32).select(
        (F.col("id") / per_doc).cast("long").alias("doc_id"),
        (F.xxhash64("id", F.lit(1)) % B).alias("f"),
        ((F.col("id") % 5) == 0).alias("is_tgt"),
    ).withColumn("f", F.abs("f"))
    t0 = time.time()
    raw = feats.groupBy("f").agg(F.count(F.lit(1)).alias("craw"))
    tgt = feats.filter("is_tgt").groupBy("f").agg(F.count(F.lit(1)).alias("ctgt"))
    tot = raw.agg(F.sum("craw").alias("traw")).crossJoin(
        feats.filter("is_tgt").agg(F.count(F.lit(1)).alias("ttgt"))
    )
    ratio = (
        raw.join(tgt, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.expr(
                f"CAST(CAST(coalesce(ctgt,0)+1 AS DECIMAL(38,0)) * (traw+{B}) * 1000000"
                f" div (CAST(craw+1 AS DECIMAL(38,0)) * (ttgt+{B})) AS BIGINT)"
            ).alias("r_micro"),
        )
    )
    scored = (
        feats.join(F.broadcast(ratio), "f")
        .groupBy("doc_id")
        .agg(F.expr("CAST(SUM(r_micro) div COUNT(*) AS BIGINT)").alias("score"))
        .count()
    )
    t_dsir = time.time() - t0
    print(f"dsir_scoring: {n:,} features -> {scored:,} docs scored in {t_dsir:.1f}s")

    # --- training shuffle: n (doc, epoch) rows into 64 shard windows -------
    from pyspark.sql.window import Window

    SH = 64
    t0 = time.time()
    pairs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.abs(F.xxhash64("id", F.lit(7))).alias("h"),
    )
    w = Window.partitionBy(F.expr(f"h % {SH}")).orderBy(F.expr(f"h div {SH}"), "doc_id")
    # aggregate over pos so the optimizer cannot prune the window
    out = (
        pairs.select(
            "doc_id",
            F.expr(f"h % {SH}").alias("shard"),
            F.row_number().over(w).alias("pos"),
        )
        .agg(F.sum("pos"))
        .collect()[0][0]
    )
    t_shuf = time.time() - t0
    print(f"training_shuffle: {n:,} rows (pos checksum {out:,}) -> {SH} shard windows in {t_shuf:.1f}s")

    # --- PIT join: n facts against n/10 dim intervals ----------------------
    t0 = time.time()
    dim = spark.range(n // 10, numPartitions=32).select(
        (F.col("id") % 1_000_000).alias("user_id"),
        (F.col("id") * 10).alias("t"),
        F.lit(1).alias("is_dim"),
        (F.col("id") % 97).cast("string").alias("state"),
    )
    facts = spark.range(n, numPartitions=32).select(
        (F.col("id") % 1_000_000).alias("user_id"),
        F.col("id").alias("t"),
        F.lit(0).alias("is_dim"),
        F.lit(None).cast("string").alias("state"),
    )
    merged = dim.unionByName(facts)
    wm = (
        Window.partitionBy("user_id")
        .orderBy("t", F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # aggregate over st so the running-last window actually executes
    joined = (
        merged.withColumn("st", F.last("state", ignorenulls=True).over(wm))
        .filter(F.col("is_dim") == 0)
        .agg(F.count("st"))
        .collect()[0][0]
    )
    t_pit = time.time() - t0
    print(
        f"pit_join: {n:,} facts x {n // 10:,} dim rows -> {joined:,} in {t_pit:.1f}s"
    )


if __name__ == "__main__":
    main()
