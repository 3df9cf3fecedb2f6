"""Interval-analytics stress: sweep-line concurrency and FIFO
allocation at millions of rows.

- Sweep line: N synthetic sessions -> 2N boundary events -> running-sum
  concurrency. The only ordered pass runs over the DEDUPLICATED
  boundary timeline.
- FIFO: N in/out layers across G groups -> running-sum intervals ->
  per-group interval-intersection join. Work is linear in rows plus the
  per-group overlap fan-out.

Reproduce: python scripts/stress_intervals.py (results in SCALE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_intervals")
    spark.range(1).count()

    # --- sweep line over 2M sessions -------------------------------------
    n = 2_000_000
    t0 = time.time()
    sess = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 86_400_000_000)).alias("s"),
        (
            F.pmod(F.xxhash64("id"), 86_400_000_000)
            + 60_000_000
            + F.pmod(F.xxhash64("id", F.lit(1)), 3_600_000_000)
        ).alias("e"),
    )
    bounds = sess.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    agg = bounds.groupBy("t").agg(F.sum("d").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    peak = (
        agg.select(F.sum("d").over(w).alias("conc"))
        .agg(F.max("conc"))
        .first()[0]
    )
    print(f"sweep-line: {n} sessions peak={peak} wall={time.time()-t0:.1f}s", flush=True)

    # --- FIFO over 2M layers, 200 groups ---------------------------------
    t0 = time.time()
    l = spark.range(n).select(
        ((F.col("id") / 2).cast("long") % 200).alias("grp"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), 50) + 1).alias("q"),
        F.when(F.col("id") % 2 == 0, "in").otherwise("out").alias("side"),
    )
    wq = (
        Window.partitionBy("grp", "side")
        .orderBy("rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = l.withColumn("hi", F.sum("q").over(wq)).withColumn(
        "lo", F.col("hi") - F.col("q")
    )
    i = iv.filter(F.col("side") == "in").select(
        "grp", F.col("lo").alias("ilo"), F.col("hi").alias("ihi")
    )
    o = iv.filter(F.col("side") == "out").select(
        "grp", F.col("lo").alias("olo"), F.col("hi").alias("ohi")
    )
    n_alloc = (
        i.join(o, "grp")
        .filter((F.col("ilo") < F.col("ohi")) & (F.col("olo") < F.col("ihi")))
        .count()
    )
    print(
        f"fifo: {n} layers / 200 groups allocations={n_alloc} "
        f"wall={time.time()-t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
