"""Plant-a-violation self-test for the explain_audit matchers (r7,
verdict item 5): every FORBIDDEN needle must be demonstrably matchable
against real formatted-explain output — the r5/r6 audits carried ~200
'Exchange SinglePartition' needles that could never fire because that
literal is simple-mode syntax formatted explain never prints.

Builds real plans with known shapes and asserts the Arguments-based
matcher fires on the violating plan and stays silent on the clean one.
"""

from __future__ import annotations

import importlib.util
import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _audit_mod():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "explain_audit.py"
    )
    spec = importlib.util.spec_from_file_location("ea_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ea():
    return _audit_mod()


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_single_partition_needle_fires_on_global_window(spark, ea):
    """A window with no partitionBy funnels through an Exchange whose
    Arguments say SinglePartition — the planted violation the old
    substring needle could never catch."""
    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    plan = _formatted(df)
    assert "Exchange SinglePartition" not in plan, (
        "formatted explain started printing the simple-mode literal; "
        "the substring needle would work again — revisit the matcher"
    )
    assert ea.plan_feature_hit(plan, "Exchange SinglePartition")


def test_single_partition_needle_silent_on_keyed_agg(spark, ea):
    df = spark.range(100).groupBy((F.col("id") % 7).alias("k")).agg(
        F.sum("id").alias("s")
    )
    plan = _formatted(df)
    assert not ea.plan_feature_hit(plan, "Exchange SinglePartition")
    # ...while the hashpartitioning needle fires on exactly this plan
    assert ea.plan_feature_hit(plan, "Exchange hashpartitioning")


def test_plain_substring_needles_still_work(spark, ea):
    a = spark.range(10)
    b = spark.range(10)
    cross = a.crossJoin(b)
    plan = _formatted(cross)
    assert ea.plan_feature_hit(plan, "BroadcastNestedLoopJoin") or \
        ea.plan_feature_hit(plan, "CartesianProduct")
    clean = _formatted(a.join(b, "id"))
    assert not ea.plan_feature_hit(clean, "CartesianProduct")


def test_every_forbidden_needle_is_matchable(spark, ea):
    """Audit-table hygiene: every needle in FORBIDDEN (hand-written +
    generated) is either Arguments-matched or a node name that real
    formatted output prints — no dead letters can re-enter."""
    node_names = {
        "CartesianProduct", "BroadcastNestedLoopJoin", "Exchange",
        "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
        "Window",
    }
    for name, needles in ea.FORBIDDEN.items():
        for n in needles:
            assert n in ea._ARG_MATCHED_NEEDLES or n in node_names, (
                f"{name}: needle {n!r} is neither Arguments-matched nor "
                "a known plan node name — it may be a dead letter"
            )


def test_single_partition_bounded_on_planted_plans(spark, ea):
    """The |V|-bound invariant: a global window over RAW rows is
    unbounded; the same window over a keyed aggregation is bounded."""
    raw = spark.range(1000).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    ok, why = ea.single_partition_bounded(_formatted(raw))
    assert not ok, why

    agged = (
        spark.range(1000)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.sum("id").alias("s"))
        .select("k", F.row_number().over(Window.orderBy("s")).alias("rn"))
    )
    ok, why = ea.single_partition_bounded(_formatted(agged))
    assert ok, why


def test_single_partition_cardinality_class(spark, ea):
    """r8 verdict item 1: post-aggregation is necessary but NOT
    sufficient — an aggregate keyed by an ENTITY column (one row per
    user/doc) still grows with the corpus and must FAIL the invariant;
    a bounded-dimension key passes with its class named; r12: an
    aliased derived key resolves through its defining expression
    (modulo-literal here) instead of passing as 'unclassified'."""

    def ranked_over(key_alias: str):
        return (
            spark.range(1000)
            .groupBy((F.col("id") % 7).alias(key_alias))
            .agg(F.sum("id").alias("s"))
            .select(
                key_alias,
                F.row_number().over(Window.orderBy("s")).alias("rn"),
            )
        )

    ok, why = ea.single_partition_bounded(_formatted(ranked_over("user_id")))
    assert not ok and "entity-cardinality" in why, why

    ok, why = ea.single_partition_bounded(_formatted(ranked_over("nation")))
    assert ok and "bounded key 'nation'" in why, why

    # the alias-resolution hole (r9 verdict item 3): 'mystery' is in no
    # class table, but its defining expression (id % 7) is provably
    # bounded — the resolver must find it instead of shrugging
    ok, why = ea.single_partition_bounded(_formatted(ranked_over("mystery")))
    assert ok and ("modulo-literal" in why or "bounded sources" in why), why


def test_single_partition_unresolvable_key_fails_unless_attributed(spark, ea):
    """r12: a key that neither classifies nor resolves (a scan column
    with no defining expression in the plan) FAILS the invariant —
    unless the (query, key) pair carries an explicit bounded-
    cardinality attribution stating the bounding argument."""
    df = (
        spark.createDataFrame([(i % 3,) for i in range(30)], "mystery long")
        .groupBy("mystery")
        .agg(F.sum("mystery").alias("s"))
        .select(
            "mystery", F.row_number().over(Window.orderBy("s")).alias("rn")
        )
    )
    plan = _formatted(df)
    ok, why = ea.single_partition_bounded(plan, "some_query")
    assert not ok and "SINGLE_PARTITION_KEY_ATTRIBUTION" in why, why

    ea.SINGLE_PARTITION_KEY_ATTRIBUTION[("some_query", "mystery")] = (
        "test: 3 distinct values by construction"
    )
    try:
        ok, why = ea.single_partition_bounded(plan, "some_query")
        assert ok and "attributed" in why, why
    finally:
        del ea.SINGLE_PARTITION_KEY_ATTRIBUTION[("some_query", "mystery")]


def test_entity_key_cannot_hide_behind_alias(spark, ea):
    """A derived key whose DEFINING expression references an entity
    column (and is not a provably bounding form) must classify entity
    and FAIL — the exact hole the r9 verdict warned about: 'a future
    entity-keyed k could slip through as reviewed-bounded'."""
    df = (
        spark.createDataFrame([(i,) for i in range(30)], "user_id long")
        .groupBy((F.col("user_id") * 2).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select("k", F.row_number().over(Window.orderBy("c")).alias("rn"))
    )
    ok, why = ea.single_partition_bounded(_formatted(df), "q")
    assert not ok and "entity" in why, why


def test_window_keyed_by_gpid_needle(spark, ea):
    """The distrank audit rows' 'never global' claim is machine-
    matched (r9 what's-wrong #3): the needle fires only when a Window
    detail block's partition spec carries _gpid."""
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_sums,
    )

    df = spark.range(100).select(
        (F.col("id") % 11).alias("v"), F.col("id").alias("uid")
    )
    ranked = prefix_sums(
        df, [F.col("v").asc(), F.col("uid").asc()], rn_out="rn"
    )
    assert ea.plan_feature_hit(_formatted(ranked), "Window keyed by _gpid")

    plain = df.select(
        "v", F.row_number().over(Window.orderBy("v", "uid")).alias("rn")
    )
    assert not ea.plan_feature_hit(
        _formatted(plain), "Window keyed by _gpid"
    )


def test_modulo_inside_larger_expression_is_not_bounding(spark, ea):
    """r12 false-pass regression: a '% literal' occurring INSIDE a
    larger expression (a jittered block id: floor((x + CASE x%10...)
    / 65536)) bounds nothing — the key grows with |rows|/65536 and
    must FAIL (unknown, no attribution), not classify modulo-literal."""
    df = (
        spark.createDataFrame([(i,) for i in range(100)], "event_id long")
        .groupBy(
            F.floor(
                (
                    F.col("event_id")
                    + F.when(
                        F.col("event_id") % 10 == 0, F.lit(5)
                    ).otherwise(F.lit(0))
                )
                / 65536
            ).alias("blk")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select("blk", F.row_number().over(Window.orderBy("c")).alias("rn"))
    )
    ok, why = ea.single_partition_bounded(_formatted(df), "q")
    assert not ok and "blk" in why, why


def test_calendar_rule_is_whole_expression(spark, ea):
    """`year(d)*12 + month(d)` is calendar-bounded; `x + month(d)` is
    not (the non-calendar source x survives the strip and must drive
    the classification)."""
    base = spark.createDataFrame(
        [(i, "2024-0%d-01" % (i % 9 + 1)) for i in range(20)],
        "x long, d string",
    ).select("x", F.col("d").cast("date").alias("d"))

    cal = (
        base.groupBy(
            (F.year("d") * 12 + F.month("d")).alias("m")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select("m", F.row_number().over(Window.orderBy("c")).alias("rn"))
    )
    ok, why = ea.single_partition_bounded(_formatted(cal), "q")
    assert ok and ("calendar-unit" in why or "bounded sources" in why), why

    mixed = (
        base.groupBy((F.col("x") + F.month("d")).alias("m"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select("m", F.row_number().over(Window.orderBy("c")).alias("rn"))
    )
    ok, why = ea.single_partition_bounded(_formatted(mixed), "q")
    assert not ok, why
