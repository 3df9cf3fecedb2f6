"""Unit tests for batch-104: fairness & inequality auditing.

A two-region scenario with hand-built confusion cells: region A has
one order in each (pred, outcome) cell — every rate is exactly 0.5 —
while region B has only true positives, pinning the NULL-margin
guards (FPR/NPV undefined), the 0.5 disparate-impact ratio and the
80%-rule flag. The Theil test uses a 4-customer spend profile whose
decomposition has a closed form (equal-share groups => between = 0).
"""

from __future__ import annotations

import datetime as dt
import math


def _write_world(spark, path, orders, lineitems, customers):
    """customers: list of (custkey, region 0/1). orders: list of
    (orderkey, custkey, totalprice). lineitems: (orderkey, discount,
    returnflag)."""
    spark.createDataFrame(
        [(0, "AMERICA"), (1, "EUROPE")], "r_regionkey long, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/region.parquet")
    spark.createDataFrame(
        [(0, 0), (1, 1)], "n_nationkey long, n_regionkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")
    spark.createDataFrame(
        [(ck, rg) for ck, rg in customers],
        "c_custkey long, c_nationkey long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        [
            (ok, ck, "O", price, dt.datetime(1996, 3, 1), "3-MEDIUM")
            for ok, ck, price in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        [(ok, d, rf) for ok, d, rf in lineitems],
        "l_orderkey long, l_discount double, l_returnflag string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _two_region_world(spark, path):
    """Region A (AMERICA): cells (1,1),(1,0),(0,1),(0,0); region B
    (EUROPE): two (1,1) orders."""
    customers = [(1, 0), (2, 1)]
    orders = [
        (10, 1, 100.0), (11, 1, 100.0), (12, 1, 100.0), (13, 1, 100.0),
        (20, 2, 100.0), (21, 2, 100.0),
    ]
    lineitems = [
        (10, 0.10, "R"),   # A: pred 1, outc 1
        (11, 0.10, "N"),   # A: pred 1, outc 0
        (12, 0.00, "R"),   # A: pred 0, outc 1
        (13, 0.00, "N"),   # A: pred 0, outc 0
        (20, 0.10, "R"),   # B: pred 1, outc 1
        (21, 0.10, "R"),   # B: pred 1, outc 1
    ]
    _write_world(spark, path, orders, lineitems, customers)


def test_demographic_parity_rates(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_demographic_parity_report,
    )

    _two_region_world(spark, tmp_path)
    out = {r.grp: r for r in q_demographic_parity_report(spark, str(tmp_path)).collect()}
    assert out["AMERICA"].n_orders == 4 and out["AMERICA"].n_positive == 2
    assert abs(out["AMERICA"].pos_rate_6 - 0.5) <= 1e-9
    assert abs(out["EUROPE"].pos_rate_6 - 1.0) <= 1e-9
    assert abs(out["AMERICA"].di_ratio_6 - 0.5) <= 1e-9
    assert abs(out["EUROPE"].di_ratio_6 - 1.0) <= 1e-9


def test_equalized_odds_cells_and_null_margins(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_equalized_odds_report,
    )

    _two_region_world(spark, tmp_path)
    out = {r.grp: r for r in q_equalized_odds_report(spark, str(tmp_path)).collect()}
    a = out["AMERICA"]
    assert (a.tp, a.fp, a.fn, a.tn) == (1, 1, 1, 1)
    assert abs(a.tpr_6 - 0.5) <= 1e-9 and abs(a.fpr_6 - 0.5) <= 1e-9
    b = out["EUROPE"]
    assert (b.tp, b.fp, b.fn, b.tn) == (2, 0, 0, 0)
    assert abs(b.tpr_6 - 1.0) <= 1e-9
    assert b.fpr_6 is None  # fp + tn == 0


def test_predictive_parity_and_prevalence(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_predictive_parity_report,
    )

    _two_region_world(spark, tmp_path)
    out = {r.grp: r for r in q_predictive_parity_report(spark, str(tmp_path)).collect()}
    a = out["AMERICA"]
    assert abs(a.ppv_6 - 0.5) <= 1e-9 and abs(a.npv_6 - 0.5) <= 1e-9
    assert abs(a.prevalence_6 - 0.5) <= 1e-9
    b = out["EUROPE"]
    assert abs(b.ppv_6 - 1.0) <= 1e-9
    assert b.npv_6 is None  # tn + fn == 0
    assert abs(b.prevalence_6 - 1.0) <= 1e-9


def test_disparate_impact_fails_80pct(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_disparate_impact_flag,
    )

    _two_region_world(spark, tmp_path)
    r = q_disparate_impact_flag(spark, str(tmp_path)).collect()[0]
    assert r.n_groups == 2
    assert abs(r.min_rate_6 - 0.5) <= 1e-9
    assert abs(r.max_rate_6 - 1.0) <= 1e-9
    assert abs(r.di_ratio_6 - 0.5) <= 1e-9
    assert bool(r.fails_80pct_rule) is True


def test_group_rate_ztest_two_proportions(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_group_rate_ztest,
    )

    _two_region_world(spark, tmp_path)
    out = {r.grp: r for r in q_group_rate_ztest(spark, str(tmp_path)).collect()}
    a = out["AMERICA"]
    assert abs(a.rate_6 - 0.5) <= 1e-9 and abs(a.rest_rate_6 - 1.0) <= 1e-9
    pool = 4 / 6
    z = (0.5 - 1.0) / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 2))
    assert abs(a.z_6 - round(z, 6)) <= 1e-9


def test_theil_decomposition_equal_share_groups(spark, tmp_path):
    """Spends A:[1.00, 3.00], B:[2.00, 2.00] dollars: group shares
    equal population shares => between = 0; total = within."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline104 import (
        q_theil_inequality_decomposition,
    )

    customers = [(1, 0), (2, 0), (3, 1), (4, 1)]
    orders = [
        (10, 1, 1.00), (11, 2, 3.00), (12, 3, 2.00), (13, 4, 2.00),
    ]
    lineitems = [(10, 0.0, "N"), (11, 0.0, "N"), (12, 0.0, "N"), (13, 0.0, "N")]
    _write_world(spark, tmp_path, orders, lineitems, customers)
    r = q_theil_inequality_decomposition(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.n_groups) == (4, 2)
    # terms: (x/S) ln(x*n/S) for x in cents [100,300,200,200], S=800, n=4
    expect = sum(
        round((x / 800) * math.log(x * 4 / 800), 9) for x in (100, 300, 200, 200)
    )
    assert abs(r.theil_total_6 - round(expect, 6)) <= 1e-9
    assert abs(r.theil_between_6 - 0.0) <= 1e-9
    assert abs(r.theil_within_6 - round(expect, 6)) <= 1e-9
