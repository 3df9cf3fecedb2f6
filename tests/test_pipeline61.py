"""Unit tests for batch-61: exact weighted median per group."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_weighted_median_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline61 import (
        q_weighted_median_groups,
    )

    out = {r.event_type: r for r in q_weighted_median_groups(spark, SF).collect()}
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            "value",
            (F.length(F.coalesce("props", F.lit(""))) + 1).alias("wt"),
        )
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(out) == set(by_type)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: (r.value, r.event_id))
        total = sum(r.wt for r in rs)
        cum = 0
        for r in rs:
            cum += r.wt
            if 2 * cum >= total:
                assert out[t].weighted_median == round(r.value, 6)
                assert out[t].total_w == total
                break


def test_weighted_median_known_case(spark):
    """Weight pulls the median toward the heavy value."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline61 import (
        q_weighted_median_groups,
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # values 1,2,3 with weights 1,1,5 (props lengths 0,0,4 -> +1)
        spark.createDataFrame(
            [(1, "x", 1.0, ""), (2, "x", 2.0, ""), (3, "x", 3.0, "wwww")],
            "event_id long, event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        r = q_weighted_median_groups(spark, d).collect()[0]
    # cum weights 1,2,7 of total 7 -> first 2*cum>=7 is value 3.0
    assert r.weighted_median == 3.0 and r.total_w == 7
