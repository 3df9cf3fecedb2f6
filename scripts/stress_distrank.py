"""distrank placement stress (r11): measure the single-partition window
against the two-pass distributed protocol on growing distinct-value
tables, locating the crossover that justifies the adaptive threshold.

The converted catalog queries cumulate over distinct-METRIC tables that
are ~1e5 rows at sf0.1 but corpus-growing; the adaptive gate keeps them
on the window below SPARK_GRAFT_DISTRANK_SMALL_ROWS and escalates past
it. This harness builds synthetic (key, cnt) tables at rising |V|,
runs `global_prefix_sums` under BOTH placements (threshold forced), and
records warm wall + equality of a checksum aggregate.

Usage: python scripts/stress_distrank.py [sizes_csv]
Writes artifacts/stress_distrank_r11.json.
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

    from prosnet_prefect_pipelines_spark.operators import distrank
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    spark = get_spark("stress_distrank")
    spark.range(1).count()
    results = {}
    for n in sizes:
        base = spark.range(0, n, 1, 32).select(
            ((F.col("id") * 2654435761) % F.lit(2**31)).alias("v"),
            (F.col("id") % 97 + 1).alias("c"),
        )
        row = {}
        for mode, threshold in (("window", 2**62), ("distributed", 0)):
            distrank._SMALL_ROWS = threshold
            times, check = [], None
            for _ in range(2):
                sweep_persistent_rdds(spark)
                t0 = time.time()
                # v is unique (odd multiplier is a bijection mod 2^31),
                # so ordering by v alone is total
                cum, nn, tots = distrank.global_prefix_sums(
                    base, [F.col("v").asc()], {"cc": F.col("c")},
                    rn_out="rn",
                )
                check = int(
                    cum.agg(
                        F.sum(
                            (F.col("rn") * F.col("cc")).cast("decimal(38,0)")
                        ).alias("x")
                    ).collect()[0]["x"]
                ) % (2**61)
                times.append(round(time.time() - t0, 3))
            row[mode] = {"warm_s": min(times), "checksum": check, "n": nn}
            print(f"# |V|={n} {mode}: {times} checksum={check}",
                  file=sys.stderr)
        row["equal"] = row["window"]["checksum"] == row["distributed"]["checksum"]
        results[str(n)] = row
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "artifacts", "stress_distrank_r11.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: {"window": v["window"]["warm_s"],
                          "distributed": v["distributed"]["warm_s"],
                          "equal": v["equal"]} for k, v in results.items()}))


if __name__ == "__main__":
    main()
