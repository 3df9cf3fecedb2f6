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
    a bounded-dimension key passes with its class named; an
    unclassifiable derived key passes via the shape test but prints
    the keys for review."""

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
    assert ok and "bounded keys" in why, why

    ok, why = ea.single_partition_bounded(_formatted(ranked_over("mystery")))
    assert ok and "unclassified keys ['mystery']" in why, why
