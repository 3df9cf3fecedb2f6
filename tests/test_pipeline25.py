"""Unit tests for batch-25: TPC-H completion through the pure SQL API.

The DuckDB hash-equality gate lives in scripts/check_correctness.py;
these tests pin the semantic invariants that a hash can't explain —
ordering, share bounds, exact-integer determinism.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_tpch_q1_groups_and_averages(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q1

    rows = q_sql_tpch_q1(spark, SF).collect()
    assert 1 <= len(rows) <= 6  # |returnflag| x |linestatus| <= 3x2
    for r in rows:
        # avg identities hold exactly: avg_qty * count == sum_qty
        assert abs(r.avg_qty * r.count_order - r.sum_qty) < 1e-6
        assert 0.0 <= r.avg_disc <= 0.11
    keys = [(r.l_returnflag, r.l_linestatus) for r in rows]
    assert keys == sorted(keys)


def test_tpch_q6_single_row_nonnegative(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q6

    rows = q_sql_tpch_q6(spark, SF).collect()
    assert len(rows) == 1
    assert rows[0].revenue is None or rows[0].revenue >= 0.0


def test_tpch_q7_symmetric_nation_pairs(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q7

    rows = q_sql_tpch_q7(spark, SF).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(1996 <= r.l_year <= 1997 for r in rows)


def test_tpch_q8_share_bounded(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q8

    rows = q_sql_tpch_q8(spark, SF).collect()
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)
    assert [r.o_year for r in rows] == sorted(r.o_year for r in rows)


def test_tpch_q13_histogram_accounts_for_every_customer(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q13

    rows = q_sql_tpch_q13(spark, SF).collect()
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_customers


def test_tpch_q15_returns_the_max_supplier(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q15

    rows = q_sql_tpch_q15(spark, SF).collect()
    assert len(rows) >= 1
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # every returned supplier ties at the max


def test_tpch_q18_ordered_and_above_threshold(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q18

    rows = q_sql_tpch_q18(spark, SF).collect()
    assert all(r.sum_qty > 300 for r in rows)
    prices = [r.totalprice_cents for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_tpch_q22_excludes_recent_buyers(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline25 import q_sql_tpch_q22

    rows = q_sql_tpch_q22(spark, SF).collect()
    assert all(r.numcust >= 1 for r in rows)
    # cross-check the anti-join: customers counted must exceed the mean
    # balance, so the per-nation total averages above it
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    mean_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    for r in rows:
        assert r.totacctbal / r.numcust > mean_bal
