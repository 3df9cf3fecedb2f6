"""Stress runs for the batch 27-28 operators at synthetic scale — the
numbers behind SCALE.md's measured entries (CCNet line dedup, LPA,
wedge-based link scores).

Usage: python scripts/stress_r3.py [rows_millions]
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

    spark = get_spark("stress_r3")
    spark.range(1).count()  # warm

    # --- corpus-global line dedup: n lines, ~25% duplicated ---------------
    # duplicate population: every 4th line re-uses a small template pool,
    # the rest are unique — mirrors boilerplate floods in web corpora
    lines = spark.range(n, numPartitions=32).select(
        (F.col("id") % 1_000_000).alias("doc_id"),
        (F.col("id") / 1_000_000).cast("long").alias("line_id"),
        F.when(
            F.col("id") % 4 == 0, F.concat(F.lit("boilerplate-"), (F.col("id") % 5000).cast("string"))
        )
        .otherwise(F.concat(F.lit("unique-"), F.col("id").cast("string")))
        .alias("line"),
    )
    t0 = time.time()
    keepers = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_id")).alias("first_at")
    )
    survivors = (
        lines.join(keepers, "line")
        .filter(
            (F.col("doc_id") == F.col("first_at.doc_id"))
            & (F.col("line_id") == F.col("first_at.line_id"))
        )
        .count()
    )
    t_dedup = time.time() - t0
    dropped = n - survivors
    print(
        f"line_dedup_global: {n:,} lines (25% from a 5k template pool) -> "
        f"{survivors:,} survive, {dropped:,} dropped in {t_dedup:.1f}s"
    )

    # --- LPA: constant-degree graph, 2 sync rounds ------------------------
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _und_edges  # noqa: F401

    m1, m2 = n // 10 + 1, n // 10 + 3
    e = (
        spark.range(n, numPartitions=32)
        .select(
            F.least(F.col("id") % m1, F.col("id") % m2).alias("a"),
            F.greatest(F.col("id") % m1, F.col("id") % m2).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint()
    n_edges = und.count() // 2
    from pyspark.sql.window import Window

    t0 = time.time()
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(2):
        counted = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst"), F.col("label").alias("lbl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("mx", F.max("cnt").over(Window.partitionBy("dst")))
        )
        labels = (
            counted.filter(F.col("cnt") == F.col("mx"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("label"))
        )
    n_comm = labels.select("label").distinct().count()
    t_lpa = time.time() - t0
    print(
        f"lpa_2rounds: {n_edges:,} undirected edges -> "
        f"{n_comm:,} communities in {t_lpa:.1f}s"
    )

    # --- wedge link scores on the same graph ------------------------------
    t0 = time.time()
    deg = und.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    e1, e2 = und.alias("e1"), und.alias("e2")
    wedge = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .select(F.col("e1.src").alias("a"), F.col("e1.dst").alias("w"), F.col("e2.dst").alias("b"))
    )
    canon = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cand = (
        wedge.join(deg.withColumnRenamed("node", "w").withColumnRenamed("d", "dw"), "w")
        .join(canon, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    n_cand = cand.count()
    t_wedge = time.time() - t0
    print(
        f"link_scores: {n_edges:,} edges -> {n_cand:,} candidate non-edges "
        f"(wedge-bounded) in {t_wedge:.1f}s"
    )


if __name__ == "__main__":
    main()
