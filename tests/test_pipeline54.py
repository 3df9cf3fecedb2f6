"""Unit tests for batch-54: path rollup, delta encoding, impossible
travel."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_path_rollup_counts(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline54 import (
        q_path_hierarchy_rollup,
    )

    rows = q_path_hierarchy_rollup(spark, SF).collect()
    assert rows
    lvl1 = {r.prefix: r.n_docs for r in rows if r.depth == 1}
    lvl2 = {r.prefix: r.n_docs for r in rows if r.depth == 2}
    # every depth-2 prefix extends a depth-1 prefix and never exceeds it
    for p2, n2 in lvl2.items():
        p1 = "/" + p2.split("/")[1]
        assert p1 in lvl1 and n2 <= lvl1[p1]
    # the synthetic corpus has /a and /pub branches at depth 1
    assert "/a" in lvl1 and "/pub" in lvl1
    # depth-1 totals equal the number of docs with non-empty paths
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(lvl1.values()) == sum(1 for d in range(n_docs) if d % 5 in (0, 1, 3))


def test_delta_encoding_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline54 import (
        q_delta_encoding_estimate,
    )

    rows = q_delta_encoding_estimate(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.raw_bytes == r.n_rows * 8
        assert r.n_rows <= r.delta_bytes <= r.raw_bytes
        assert r.ratio_ppm == r.delta_bytes * 1_000_000 // r.raw_bytes
    # savings are data-dependent (sparse sf0.001 gaps often exceed the
    # 4-byte class); assert strict improvement, not a fixed ratio
    total_delta = sum(r.delta_bytes for r in rows)
    total_raw = sum(r.raw_bytes for r in rows)
    assert total_delta < total_raw


def test_impossible_travel_cross_multiplication(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline54 import (
        _US_HOUR,
        _VMAX,
        q_impossible_travel,
    )

    rows = q_impossible_travel(spark, SF).collect()
    assert rows
    flagged = 0
    for r in rows:
        want = r.dist2 * _US_HOUR * _US_HOUR > _VMAX * _VMAX * r.dt_us * r.dt_us
        assert r.impossible == want
        flagged += int(r.impossible)
    # the grid hops are large vs minute-scale gaps: some flags fire,
    # but stationary repeats keep it under everything
    assert 0 < flagged < len(rows)
