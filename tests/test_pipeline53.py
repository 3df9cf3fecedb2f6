"""Unit tests for batch-53: FD audit, candidate keys."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fd_audit_known_truths(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline53 import q_fd_audit

    rows = {r.fd: r for r in q_fd_audit(spark, SF).collect()}
    assert set(rows) == {
        "o_orderkey->o_orderdate",
        "l_orderkey->o_custkey",
        "l_partkey->l_suppkey",
    }
    # key FD and through-join FD hold by construction
    assert rows["o_orderkey->o_orderdate"].holds
    assert rows["l_orderkey->o_custkey"].holds
    # the deliberately false claim must show violations
    assert not rows["l_partkey->l_suppkey"].holds
    assert rows["l_partkey->l_suppkey"].violating_keys > 0
    for r in rows.values():
        assert r.holds == (r.violating_keys == 0)


def test_candidate_keys_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline53 import (
        _COMBOS,
        q_candidate_key_profile,
    )

    rows = {r.combo: r for r in q_candidate_key_profile(spark, SF).collect()}
    assert set(rows) == {n for n, _ in _COMBOS}
    for r in rows.values():
        assert 0 < r.n_distinct <= r.n_rows
        assert r.uniqueness_ppm == r.n_distinct * 1_000_000 // r.n_rows
        assert r.is_key == (r.n_distinct == r.n_rows)
    # adding columns never lowers distinctness
    assert (
        rows["l_orderkey"].n_distinct
        <= rows["l_orderkey+l_linenumber"].n_distinct
        <= rows["l_orderkey+l_linenumber+l_partkey"].n_distinct
    )
    # (orderkey, linenumber) is NOT unique in the synthetic data
    assert not rows["l_orderkey+l_linenumber"].is_key
