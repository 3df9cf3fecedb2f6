"""Unit tests for batch-97: paired, categorical and concentration
statistics.

Known-value checks: Wilcoxon signed-rank on hand-ranked differences
(with and without ties), chi-squared on a hand-computed 2x2, Gini 0.25
on [1,2,3,4], Friedman Q=6 on perfectly-agreeing 3x3 blocks,
Cochran–Armitage z on a hand-computed 3-bucket trend, point-biserial
against its closed form on a 3v3 split.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_customer(spark, path, rows):
    spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")


def _write_nation(spark, path, rows):
    spark.createDataFrame(
        rows, ["n_nationkey", "n_name", "n_regionkey"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")


def _write_region(spark, path, rows):
    spark.createDataFrame(rows, ["r_regionkey", "r_name"]).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/region.parquet")


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(
        rows, ["l_orderkey", "l_quantity", "l_returnflag"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _order(okey, cust, price, year, prio="3-MEDIUM"):
    return (okey, cust, "O", float(price), dt.datetime(year, 6, 1), prio)


def test_wilcoxon_hand_ranked_no_ties(spark, tmp_path):
    """d (cents) = +1,-2,+3,-4,+5: |d| ranks 1..5, W+ = 1+3+5 = 9,
    z = (9 - 7.5)/sqrt(5*6*11/24) = 0.404520."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_wilcoxon_signed_rank,
    )

    rows, ok = [], 0
    for cust, d in enumerate([1, -2, 3, -4, 5], start=1):
        ok += 1
        rows.append(_order(ok, cust, 100.00, 1995))
        ok += 1
        rows.append(_order(ok, cust, 100.00 + d / 100.0, 1996))
    _write_orders(spark, tmp_path, rows)
    got = q_wilcoxon_signed_rank(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 5
    assert got["w_plus_x2"] == 18
    assert got["w_minus_x2"] == 12
    assert got["z"] == pytest.approx(1.5 / math.sqrt(13.75), abs=1e-6)


def test_wilcoxon_ties_and_invariant(spark, tmp_path):
    """d = +10,-10,+20: tied |d|=10 pair averages to rank 1.5, so
    w_plus_x2 = 3+6 = 9, w_minus_x2 = 3, tie term = 2^3-2 = 6,
    z = 1.5/sqrt(3*4*7/24 - 6/48) = 0.816497."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_wilcoxon_signed_rank,
    )

    rows, ok = [], 0
    for cust, d in enumerate([10, -10, 20], start=1):
        ok += 1
        rows.append(_order(ok, cust, 50.00, 1995))
        ok += 1
        rows.append(_order(ok, cust, 50.00 + d / 100.0, 1996))
    _write_orders(spark, tmp_path, rows)
    got = q_wilcoxon_signed_rank(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 3
    assert got["w_plus_x2"] == 9
    assert got["w_minus_x2"] == 3
    assert got["w_plus_x2"] + got["w_minus_x2"] == 3 * 4
    assert got["z"] == pytest.approx(1.5 / math.sqrt(3.375), abs=1e-6)


def test_chi2_hand_computed_2x2(spark, tmp_path):
    """O = [[10,20],[30,40]]: chi2 = N(ad-bc)^2/(r1 r2 c1 c2)
    = 100*(10*40-20*30)^2/(30*70*40*60) = 0.793651, dof = 1."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_chi2_independence,
    )

    _write_region(spark, tmp_path, [(0, "AMERICA"), (1, "EUROPE")])
    _write_nation(spark, tmp_path, [(0, "US", 0), (1, "FR", 1)])
    _write_customer(
        spark,
        tmp_path,
        [(1, "a", 0, 0.0, "m"), (2, "b", 1, 0.0, "m")],
    )
    rows, ok = [], 0
    for cust, prio, cnt in [
        (1, "1-URGENT", 10),
        (1, "2-HIGH", 20),
        (2, "1-URGENT", 30),
        (2, "2-HIGH", 40),
    ]:
        for _ in range(cnt):
            ok += 1
            rows.append(_order(ok, cust, 10.0, 1995, prio))
    _write_orders(spark, tmp_path, rows)
    got = q_chi2_independence(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 100
    assert got["dof"] == 1
    expected = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert got["chi2"] == pytest.approx(expected, abs=1e-6)


def test_gini_quarter_on_1234(spark, tmp_path):
    """Spends 1,2,3,4 cents: G = (2*(1+4+9+16) - 5*10)/(4*10) = 0.25."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_gini_customer_spend,
    )

    rows = [
        _order(i, i, cents / 100.0, 1995)
        for i, cents in enumerate([1, 2, 3, 4], start=1)
    ]
    _write_orders(spark, tmp_path, rows)
    got = q_gini_customer_spend(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 4
    assert got["total_cents"] == 10
    assert got["gini"] == pytest.approx(0.25, abs=1e-6)


def test_gini_all_equal_is_zero(spark, tmp_path):
    """Perfect equality (all spends identical) -> G = 0; exercises the
    tie-block identity with ONE block of size n."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_gini_customer_spend,
    )

    rows = [_order(i, i, 7.00, 1995) for i in range(1, 6)]
    _write_orders(spark, tmp_path, rows)
    got = q_gini_customer_spend(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 5
    assert got["gini"] == pytest.approx(0.0, abs=1e-9)


def test_friedman_perfect_agreement(spark, tmp_path):
    """3 blocks x 3 treatments, identical orderings: R_j = 3,6,9 ->
    Q = 12/(3*3*4)*(9+36+81) - 3*3*4 = 6."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_friedman_nation_priority,
    )

    _write_customer(
        spark,
        tmp_path,
        [(b + 1, f"c{b}", b, 0.0, "m") for b in range(3)],
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    rows, ok = [], 0
    for b in range(3):
        for j, p in enumerate(prios):
            ok += 1
            rows.append(_order(ok, b + 1, 10.0 * (j + 1), 1995, p))
    _write_orders(spark, tmp_path, rows)
    got = q_friedman_nation_priority(spark, str(tmp_path)).collect()[0]
    assert got["blocks"] == 3
    assert got["k"] == 3
    assert got["sum_rd_sq"] == 36 + 144 + 324
    assert got["q_stat"] == pytest.approx(6.0, abs=1e-6)


def test_friedman_incomplete_block_dropped(spark, tmp_path):
    """A block missing one treatment is excluded from b and the rank
    sums."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_friedman_nation_priority,
    )

    _write_customer(
        spark,
        tmp_path,
        [(b + 1, f"c{b}", b, 0.0, "m") for b in range(3)],
    )
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    rows, ok = [], 0
    for b in range(2):
        for j, p in enumerate(prios):
            ok += 1
            rows.append(_order(ok, b + 1, 10.0 * (j + 1), 1995, p))
    # block 2 only observes two of the three treatments
    for j, p in enumerate(prios[:2]):
        ok += 1
        rows.append(_order(ok, 3, 10.0 * (j + 1), 1995, p))
    _write_orders(spark, tmp_path, rows)
    got = q_friedman_nation_priority(spark, str(tmp_path)).collect()[0]
    assert got["blocks"] == 2
    assert got["k"] == 3
    # two agreeing blocks: Rd_j = 4,8,12 -> 16+64+144 = 224
    assert got["sum_rd_sq"] == 224


def test_cochran_armitage_hand_computed(spark, tmp_path):
    """Buckets s=1,2,3 with (n,r) = (10,1),(10,5),(10,9):
    T*N = 38*30 - 15*60 = 240, Var*N^3 = 15*15*(30*140 - 60^2)
    = 135000, z = 240/sqrt(135000/30) = 3.577709."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_cochran_armitage_trend,
    )

    rows, lk = [], 0
    for qty, pos in [(5.0, 1), (10.0, 5), (15.0, 9)]:
        for i in range(10):
            lk += 1
            rows.append((lk, qty, "R" if i < pos else "N"))
    _write_lineitem(spark, tmp_path, rows)
    got = q_cochran_armitage_trend(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 30
    assert got["positives"] == 15
    assert got["t_num"] == 240
    assert got["z"] == pytest.approx(240 / math.sqrt(135000 / 30), abs=1e-6)


def test_point_biserial_closed_form(spark, tmp_path):
    """g=1 x=[2,3,4], g=0 x=[1,2,3] cents: d = 9*3-6*3 = 9,
    r = 9/(sqrt(9)*sqrt(6*43-225)) = 0.522233, r_sq = 81/297."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_point_biserial_corr,
    )

    rows, ok = [], 0
    for cents in [2, 3, 4]:
        ok += 1
        rows.append(_order(ok, ok, cents / 100.0, 1995, "1-URGENT"))
    for cents in [1, 2, 3]:
        ok += 1
        rows.append(_order(ok, ok, cents / 100.0, 1995, "2-HIGH"))
    _write_orders(spark, tmp_path, rows)
    got = q_point_biserial_corr(spark, str(tmp_path)).collect()[0]
    assert got["n1"] == 3 and got["n0"] == 3
    assert got["r_pb"] == pytest.approx(9 / (3 * math.sqrt(33)), abs=1e-6)
    assert got["r_sq"] == pytest.approx(81 / (9 * 33), abs=1e-6)


def test_duplicate_query_name_rejected(spark):
    """register() refuses a cross-module name collision instead of
    silently dropping a catalog entry (r5: a new batch reused
    gini_concentration and shadowed q_pipeline19's)."""
    from prosnet_prefect_pipelines_spark.plans import catalog

    catalog._load_all()
    with pytest.raises(ValueError, match="duplicate query name"):

        @catalog.register("gini_concentration")
        def q_clashing(spark, sf_dir):  # pragma: no cover
            raise AssertionError
