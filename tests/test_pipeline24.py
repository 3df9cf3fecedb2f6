"""Unit tests for batch-24 SQL-surface parity: grouping sets, unpivot,
bag set-ops, quantified predicates, lateral top-n."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_grouping_sets_granularities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline24 import q_sql_grouping_sets

    rows = q_sql_grouping_sets(spark, SF).collect()
    fine = [r for r in rows if r.returnflag != "<all>" and r.linestatus != "<all>"]
    mid = [r for r in rows if r.returnflag != "<all>" and r.linestatus == "<all>"]
    total = [r for r in rows if r.returnflag == "<all>"]
    assert len(total) == 1
    # each granularity independently sums to the grand total
    assert abs(sum(r.sum_qty for r in fine) - total[0].sum_qty) < 1e-6
    assert abs(sum(r.sum_qty for r in mid) - total[0].sum_qty) < 1e-6
    assert total[0].n == sum(r.n for r in fine)


def test_unpivot_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline24 import q_sql_unpivot

    out = q_sql_unpivot(spark, SF)
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    assert out.count() == 2 * n_parts
    attrs = {r.attr for r in out.select("attr").distinct().collect()}
    assert attrs == {"size", "retailprice"}


def test_set_ops_bag_multiplicity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline24 import q_sql_set_ops

    out = q_sql_set_ops(spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    # both + customer_only partitions the customer bag exactly
    assert len(out) == cust.count()
    per_nation_cust = {
        r.c_nationkey: r.n
        for r in cust.groupBy("c_nationkey").agg(F.count("*").alias("n")).collect()
    }
    from collections import Counter

    got = Counter((r.nationkey) for r in out)
    assert dict(got) == {k: v for k, v in per_nation_cust.items()}


def test_exists_matches_join_semantics(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline24 import q_sql_exists_antijoin

    got = {r.c_custkey for r in q_sql_exists_antijoin(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    big = {r.o_custkey for r in orders.filter("o_totalprice > 200000").collect()}
    cheap_f = {
        r.o_custkey
        for r in orders.filter(
            "o_orderstatus = 'F' and o_totalprice < 50000"
        ).collect()
    }
    cust = {r.c_custkey for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    assert got == (cust & big) - cheap_f


def test_lateral_topn_at_most_two_per_customer(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline24 import q_sql_lateral_topn

    out = q_sql_lateral_topn(spark, SF).collect()
    from collections import Counter

    per_cust = Counter(r.c_custkey for r in out)
    assert max(per_cust.values()) <= 2
    # each customer's rows are its true top orders by price
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    by_cust: dict = {}
    for o in orders:
        by_cust.setdefault(o.o_custkey, []).append((-o.o_totalprice, o.o_orderkey))
    for ck, n in list(per_cust.items())[:50]:
        expect = {k for _, k in sorted(by_cust[ck])[:2]}
        got_keys = {r.o_orderkey for r in out if r.c_custkey == ck}
        assert got_keys == expect
