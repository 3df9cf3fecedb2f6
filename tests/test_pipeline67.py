"""Unit tests for batch-67: SQL-surface parity (set ops, correlated
scalar, grains, window values, NOT-IN nulls)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_set_operations_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline67 import (
        q_sql_set_operations,
    )

    out = {r.op: r.n for r in q_sql_set_operations(spark, SF).collect()}
    assert set(out) == {"intersect", "intersect_all", "except", "except_all"}
    # bag >= set for intersect; distinct except <= 25 nations
    assert out["intersect_all"] >= out["intersect"]
    assert out["except"] <= 25
    assert out["except_all"] >= out["except"]


def test_correlated_scalar_is_per_customer_max(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline67 import (
        q_sql_correlated_scalar,
    )

    out = q_sql_correlated_scalar(spark, SF)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    expected = orders.groupBy("custkey").agg(F.max("cents").alias("exp_cents"))
    joined = out.join(expected, "custkey")
    assert joined.filter(F.col("max_cents") != F.col("exp_cents")).count() == 0
    assert out.count() == expected.count()  # every customer appears once


def test_time_grain_rollup_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline67 import (
        q_time_grain_rollup,
    )

    rows = q_time_grain_rollup(spark, SF).collect()
    per_grain_n = {}
    per_grain_cents = {}
    for r in rows:
        per_grain_n[r.grain] = per_grain_n.get(r.grain, 0) + r.n
        per_grain_cents[r.grain] = per_grain_cents.get(r.grain, 0) + r.cents
    # every grain partitions the same event set
    assert len(set(per_grain_n.values())) == 1
    assert len(set(per_grain_cents.values())) == 1
    # coarser grains have fewer-or-equal buckets
    n_buckets = {g: sum(1 for r in rows if r.grain == g) for g in per_grain_n}
    assert n_buckets["month"] <= n_buckets["week"] <= n_buckets["day"] <= n_buckets["hour"]


def test_window_values_per_nation(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline67 import (
        q_window_value_suite,
    )

    rows = q_window_value_suite(spark, SF).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.c_nationkey, []).append(r)
    for nk, rs in by_nation.items():
        rs.sort(key=lambda r: (r.cents, r.c_custkey))
        poorest, richest = rs[0].c_custkey, rs[-1].c_custkey
        for r in rs:
            assert r.poorest == poorest and r.richest == richest
            if len(rs) >= 2:
                assert r.second_poorest == rs[1].c_custkey
        # lag/lead chain consistency
        for i, r in enumerate(rs):
            assert r.prev_cents == (rs[i - 1].cents if i > 0 else None)
            assert r.next_cents == (rs[i + 1].cents if i < len(rs) - 1 else None)


def test_not_in_null_trap(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline67 import (
        q_sql_not_in_null_semantics,
    )

    out = {r.variant: r.n for r in q_sql_not_in_null_semantics(spark, SF).collect()}
    assert out["not_in_dirty"] == 0  # NULL in the list poisons NOT IN
    assert out["not_in_clean"] > 0
    assert out["not_exists"] == out["not_in_clean"]
