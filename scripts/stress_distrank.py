"""distrank protocol stress (r11, reworked r12): measure the bare
single-partition window against the distributed protocol on growing
distinct-value tables.

r11 used this harness to locate the adaptive-placement crossover
(~1M rows) for the EAGER protocol, whose fixed cost was a plan-build
materialization job. r12 removed both the job and the placement: the
protocol is fully lazy and in-plan (operators/distrank.py), so this
harness now answers two questions per size:

1. overhead — lazy protocol vs the bare unpartitioned window at small
   |V| (the price every converted sub-second query pays), and
2. scaling — protocol vs window as |V| grows past what a single
   partition should ever sort (where the window becomes the
   scale-killer the protocol exists to avoid).

Checksums assert exact equality of (rn x value) aggregates.

Usage: python scripts/stress_distrank.py [sizes_csv]
Writes artifacts/stress_distrank_r12.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else
                              "100000,1000000,4000000,16000000").split(",")]
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.operators.distrank import prefix_sums
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    spark = get_spark("stress_distrank")
    spark.range(1).count()

    def _checksum(cum) -> int:
        return int(
            cum.agg(
                F.sum(
                    (F.col("rn") * F.col("cc")).cast("decimal(38,0)")
                ).alias("x")
            ).collect()[0]["x"]
        ) % (2**61)

    results = {}
    for n in sizes:
        base = spark.range(0, n, 1, 32).select(
            ((F.col("id") * 2654435761) % F.lit(2**31)).alias("v"),
            (F.col("id") % 97 + 1).alias("c"),
        )
        # v is unique (odd multiplier is a bijection mod 2^31), so
        # ordering by v alone is total
        order = [F.col("v").asc()]
        row = {}
        for mode in ("window", "distributed"):
            times, check = [], None
            for _ in range(2):
                sweep_persistent_rdds(spark)
                t0 = time.time()
                if mode == "window":
                    w = Window.orderBy(*order)
                    cum = base.withColumn(
                        "rn", F.row_number().over(w).cast("long")
                    ).withColumn(
                        "cc",
                        F.sum("c").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)
                        ),
                    )
                else:
                    cum = prefix_sums(
                        base, order, {"cc": F.col("c")}, rn_out="rn"
                    )
                check = _checksum(cum)
                times.append(round(time.time() - t0, 3))
            row[mode] = {"warm_s": min(times), "checksum": check}
            print(f"# |V|={n} {mode}: {times} checksum={check}",
                  file=sys.stderr)
        row["equal"] = row["window"]["checksum"] == row["distributed"]["checksum"]
        results[str(n)] = row
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "artifacts", "stress_distrank_r12.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: {"window": v["window"]["warm_s"],
                          "distributed": v["distributed"]["warm_s"],
                          "equal": v["equal"]} for k, v in results.items()}))


if __name__ == "__main__":
    main()
