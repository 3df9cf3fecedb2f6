"""Unit tests for batch-84: robustness corners."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_confusables_flags(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline84 import (
        q_unicode_confusables_audit,
    )

    rows = {r.n_nationkey: r for r in q_unicode_confusables_audit(spark, SF).collect()}
    # keys 0, 10, 20 got the Cyrillic A planted (their names contain A)
    for k, r in rows.items():
        if k % 10 == 0 and "А" in r.name:
            assert r.has_cyrillic == 1 and r.mixed_script == 1
        elif r.has_cyrillic == 0:
            assert r.mixed_script == 0
    # char length counts characters, not bytes: planted rows keep length
    src = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    for k, r in rows.items():
        assert r.n_chars == len(src[k])


def test_null_agg_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline84 import (
        q_null_aggregate_semantics,
    )

    rows = q_null_aggregate_semantics(spark, SF).collect()
    for r in rows:
        assert r.count_v <= r.count_star
        assert r.sum_coalesced == (r.sum_v or 0)
        if r.count_v:
            assert r.mean_micro_null_skipping == r.sum_v * 1_000_000 // r.count_v


def test_overflow_exact(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline84 import (
        q_overflow_safe_sums,
    )

    (r,) = q_overflow_safe_sums(spark, SF).collect()
    total = sum(4611686018427387904 + k for k in range(25))
    assert r.n == 25
    assert r.sum_div_1e9 == total // 10**9
    assert r.sum_mod_1e9 == total % 10**9


def test_empty_group_null_vs_zero(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline84 import (
        q_empty_group_semantics,
    )

    rows = {r.region: r for r in q_empty_group_semantics(spark, SF).collect()}
    ghost = rows[99]
    assert ghost.is_empty == 1 and ghost.n == 0
    assert ghost.sum_v is None and ghost.sum_v_zerofilled == 0
    assert all(r.is_empty == 0 for k, r in rows.items() if k != 99)


def test_binary_collation_upper_first(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline84 import (
        q_binary_collation_order,
    )

    rows = sorted(q_binary_collation_order(spark, SF).collect(), key=lambda r: r.rn)
    names = [r.name for r in rows]
    assert names == sorted(names)  # python sorts by codepoint too
    # all uppercase-initial names precede lowercase-initial ones
    seen_lower = False
    for n in names:
        if n[0].islower():
            seen_lower = True
        else:
            assert not seen_lower
