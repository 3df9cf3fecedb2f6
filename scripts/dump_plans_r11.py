"""Dump .explain('formatted') for named queries into plans/r11/.

Usage:
    python scripts/dump_plans_r11.py <suffix> <outdir> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt with the formatted physical plan of
the DataFrame the catalog query returns (for replay monitors this is the
post-replay read — their work happens inside the stream; the serving
probe timings and OPTIMIZATION_r11.md carry those numbers instead).
Runs from whatever repo tree contains this script, so a baseline
worktree produces the _before files and HEAD produces _after.
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

    spark = get_spark("dump_plans_r11")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        jdf = df._jdf
        plan = jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with io.open(
            os.path.join(outdir, f"{name}_{suffix}.txt"), "w"
        ) as fh:
            fh.write(plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
        sweep_persistent_rdds(spark)
    spark.stop()


if __name__ == "__main__":
    main()
