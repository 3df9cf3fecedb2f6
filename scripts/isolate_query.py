"""Fresh-session isolation protocol for an unattributed bench regression.

The accepted attribution protocol (r22_neardup_session_drift precedent,
VERDICT r9 item 1) has two halves:

1. CONSTRUCTION: the flagged query's code is identical between the two
   compared bench trees (empty ``git diff`` over its plan + operators) —
   so a code regression is impossible and the residual must be either
   session accumulation or host/environment drift.
2. MEASUREMENT: this script — one FRESH JVM per invocation, the named
   query run cold once (recorded, excluded from the steady-state
   statistic) then warm xN with the bench's own between-run sweep.
   Running the script k times back-to-back gives k independent fresh
   sessions; if the fresh-session warm floor sits at/below the in-bench
   confirm runs and at/below the prior driver round's warm number, the
   in-bench spike was session accumulation or transient load, not a
   persistent regression; if the fresh sessions REPRODUCE the spike,
   the regression is real and stays unattributed until root-caused.

Usage:
    python scripts/isolate_query.py <query_name> [n_warm] >> out.jsonl
    # run >=3 times for the x3 protocol

Prints ONE JSON line: {"query", "sf_dir", "cold_s", "warm_s": [..],
"warm_min", "load_avg_1m_start", "load_avg_1m_end"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )

    load_start = os.getloadavg()[0]
    spark = get_spark("isolate_query")
    qs = entry_mod.queries()
    spark.range(1).count()

    t0 = time.time()
    qs[name](spark, sf_dir).count()
    cold = round(time.time() - t0, 3)

    warms: list[float] = []
    for _ in range(n_warm):
        sweep_persistent_rdds(spark)
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        warms.append(round(time.time() - t0, 3))

    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "cold_s": cold,
                "warm_s": warms,
                "warm_min": min(warms),
                "load_avg_1m_start": round(load_start, 2),
                "load_avg_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
