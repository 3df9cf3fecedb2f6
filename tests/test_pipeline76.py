"""Unit tests for batch-76: finance/accounting tier."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_fifo_conservation(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline76 import (
        q_fifo_allocation,
    )

    alloc = q_fifo_allocation(spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        (F.col("l_partkey") % 20).alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        F.when(F.col("l_orderkey") % 2 == 0, "in").otherwise("out").alias("side"),
    )
    totals = {
        (r.grp, r.side): r.t
        for r in li.groupBy("grp", "side").agg(F.sum("q").alias("t")).collect()
    }
    per_grp = {
        r.grp: r.t
        for r in alloc.groupBy("grp").agg(F.sum("qty").alias("t")).collect()
    }
    # allocated quantity per group = min(total in, total out): FIFO
    # matches until one side is exhausted
    for grp, t in per_grp.items():
        assert t == min(totals[(grp, "in")], totals[(grp, "out")])
    # no allocation exceeds either side's layer quantity
    assert alloc.filter(F.col("qty") <= 0).count() == 0


def test_trial_balance_balances(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline76 import (
        q_trial_balance_audit,
    )

    rows = q_trial_balance_audit(spark, SF).collect()
    assert sum(r.debits_cents for r in rows) == sum(r.credits_cents for r in rows)
    assert sum(r.balance_cents for r in rows) == 0


def test_rounding_policy_deltas_small(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline76 import (
        q_rounding_policy_report,
    )

    rows = q_rounding_policy_report(spark, SF).collect()
    assert rows  # the divergence class exists in this corpus
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    max_lines = (
        li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    )
    for r in rows:
        assert r.policy_delta_cents != 0
        # per-line half-up can differ from per-invoice by < 1 cent per line
        assert abs(r.policy_delta_cents) <= max_lines


def test_ar_aging_partitions_orders(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline76 import (
        q_ar_aging_report,
    )

    rows = q_ar_aging_report(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_cashflow_running_balance(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline76 import (
        q_cashflow_weekly,
    )

    rows = sorted(q_cashflow_weekly(spark, SF).collect(), key=lambda r: r.week)
    bal = 0
    for r in rows:
        assert r.net_cents == r.inflow_cents - r.outflow_cents
        bal += r.net_cents
        assert r.running_balance_cents == bal
