"""Same-host, same-tree A/B pass for fleet-residual attribution.

BENCH_DETAIL_r15 flagged a fleet-wide residual: the calibration probe
said this host ran 1.231x slower than the r14 bench host while the
median per-query ratio said 1.034, and the shared-set wall moved +8.9%.
The decisive fact is in git — the r14 and r15 benches ran on IDENTICAL
engine code (empty diff over the package, bench.py and the entry module
between 56d2f93 and 7895fc5) — so the residual cannot be code drift.
This script supplies the measurement half of that attribution: it
re-runs the exact shared query set of a reference round (default r15)
under the bench's cold protocol in ONE fresh session and prints a JSON
line; running it twice back-to-back measures the same-tree run-to-run
spread of the shared-set wall on one host. If that spread brackets the
flagged residual, the residual is host/session variance by measurement
as well as by construction.

Usage:
    python scripts/residual_ab.py [detail_json] > pass1.json
    python scripts/residual_ab.py [detail_json] > pass2.json
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    ref = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(_HERE, "artifacts", "BENCH_DETAIL_r15.json")
    )
    with open(ref) as fh:
        names = list(json.load(fh)["queries"])

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("residual_ab")
    qs = entry_mod.queries()
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
        sweep_persistent_rdds(spark)
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    print(
        json.dumps(
            {
                "reference_detail": os.path.basename(ref),
                "n_queries": len(timings),
                "shared_total_s": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
