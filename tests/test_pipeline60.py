"""Unit tests for batch-60: PSI drift, consistent-hash rebalance."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_psi_terms_and_total(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline60 import (
        N_BUCKETS,
        q_psi_drift,
    )

    rows = q_psi_drift(spark, SF).collect()
    assert len(rows) == N_BUCKETS
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1
    # total equals the scaled-integer sum of the terms
    assert abs(totals.pop() - round(sum(round(r.psi_term * 1e6) for r in rows)) / 1e6) < 1e-9
    ta = sum(r.n_a for r in rows)
    tb = sum(r.n_b for r in rows)
    for r in rows:
        p = (r.n_a + 1) / (ta + N_BUCKETS)
        q = (r.n_b + 1) / (tb + N_BUCKETS)
        assert abs(r.psi_term - round((p - q) * math.log(p / q), 6)) < 2e-6


def test_psi_identical_halves_is_zero(spark):
    """Same distribution in both periods -> every term 0."""
    import tempfile

    from prosnet_prefect_pipelines_spark.plans.q_pipeline60 import q_psi_drift

    with tempfile.TemporaryDirectory() as d:
        # period a: 2024-01-01, period b: 2024-01-19 — same values each
        data = [
            (i, ("2024-01-01 00:00:00" if j == 0 else "2024-01-19 00:00:00"), v)
            for i, (j, v) in enumerate(
                [(j, v) for v in (10.0, 60.0, 110.0) for j in (0, 1)]
            )
        ]
        spark.createDataFrame(
            data, "event_id long, ts_s string, value double"
        ).selectExpr(
            "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value"
        ).write.parquet(f"{d}/events.parquet")
        out = q_psi_drift(spark, d).collect()
    for r in out:
        assert r.psi_term == 0.0
    assert all(r.psi_total == 0.0 for r in out)


def test_consistent_hash_minimal_moves(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline60 import (
        q_consistent_hash_moves,
    )

    rows = q_consistent_hash_moves(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_keys for r in rows) == n_docs
    # the consistent-hash property: every moved key lands on a NEW node
    # (n8/n9) — old-node arcs only shrink, they never swap keys around
    for r in rows:
        assert r.moved == (r.old_node != r.new_node)
        if r.moved:
            assert r.new_node in ("n8", "n9")
    # and some keys do stay put
    assert any(not r.moved for r in rows)
