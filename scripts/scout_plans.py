"""Scout physical-plan features for catalog queries that lack an
explain_audit entry, to seed new AUDITS/FORBIDDEN assertions.

For each named query (or every un-audited one), builds the DataFrame at
sf0.001 (plan only — nothing executes except builders that internally
run, e.g. streaming twins) and prints one line of plan features:
presence of CartesianProduct / BroadcastNestedLoopJoin /
Exchange SinglePartition / Exchange hashpartitioning / Window /
partial_ / PushedFilters / BroadcastHashJoin.

Usage: python scripts/scout_plans.py [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = [
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange SinglePartition",
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "Window",
    "partial_",
    "PushedFilters: [",
]


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ea", os.path.join(os.path.dirname(os.path.abspath(__file__)), "explain_audit.py")
    )
    ea = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ea)

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("scout_plans")
    qs = entry_mod.queries()
    covered = set(ea.AUDITS) | set(ea.FORBIDDEN)
    names = sys.argv[1:] or sorted(n for n in qs if n not in covered)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # plan_feature_hit: Arguments-based matching for the
            # exchange-partitioning needles formatted explain never
            # prints literally (r7 — plain substring was vacuous)
            out[name] = {f: ea.plan_feature_hit(plan, f) for f in FEATURES}
            print(name, json.dumps(out[name]), flush=True)
        except Exception as exc:  # noqa: BLE001 — scout, report and move on
            print(name, f"ERROR {type(exc).__name__}: {exc}", flush=True)
    with open("/tmp/scout_plans.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
