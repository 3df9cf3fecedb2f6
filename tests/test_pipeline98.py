"""Unit tests for batch-98: agreement & 2x2 epidemiology statistics.

Known-value checks: McNemar chi2 = 1 on hand-built flip counts,
Cohen's kappa = 0.4 on a hand-computed 2x2, odds/risk ratios 4.0/3.0,
Mantel–Haenszel pooled OR over two hand-computed strata, runs-test z
on an alternating sequence, Durbin–Watson = 1 on the [1,2,3] series.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

HI = 200_000.0  # dollars, above the 15_000_000-cent threshold
LO = 10.0


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_dims(spark, path, regions, nations, customers):
    spark.createDataFrame(regions, ["r_regionkey", "r_name"]).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/region.parquet")
    spark.createDataFrame(
        nations, ["n_nationkey", "n_name", "n_regionkey"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")
    spark.createDataFrame(
        customers,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")


def _order(okey, cust, price, year, prio="3-MEDIUM", status="O", month=6, day=1):
    return (okey, cust, status, float(price), dt.datetime(year, month, day), prio)


def test_mcnemar_hand_built_flips(spark, tmp_path):
    """a=2 stay-high, b=3 high->low, c=1 low->high, d=4 stay-low:
    chi2 = (3-1)^2/(3+1) = 1.0."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_mcnemar_paired_flips,
    )

    rows, ok, cust = [], 0, 0
    for f95, f96, cnt in [(1, 1, 2), (1, 0, 3), (0, 1, 1), (0, 0, 4)]:
        for _ in range(cnt):
            cust += 1
            ok += 1
            rows.append(_order(ok, cust, HI if f95 else LO, 1995))
            ok += 1
            rows.append(_order(ok, cust, HI if f96 else LO, 1996))
    _write_orders(spark, tmp_path, rows)
    got = q_mcnemar_paired_flips(spark, str(tmp_path)).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (2, 3, 1, 4)
    assert got["chi2"] == pytest.approx(1.0, abs=1e-9)


def test_cohens_kappa_hand_computed(spark, tmp_path):
    """Cells a=20 b=5 c=10 d=15: pe_num = 25*30 + 25*20 = 1250,
    kappa = (50*35 - 1250)/(2500 - 1250) = 0.4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_cohens_kappa_labels,
    )

    rows, ok = [], 0
    for ra, rb, cnt in [(1, 1, 20), (1, 0, 5), (0, 1, 10), (0, 0, 15)]:
        for _ in range(cnt):
            ok += 1
            rows.append(
                _order(
                    ok,
                    ok,
                    HI if rb else LO,
                    1995,
                    prio="1-URGENT" if ra else "3-MEDIUM",
                )
            )
    _write_orders(spark, tmp_path, rows)
    got = q_cohens_kappa_labels(spark, str(tmp_path)).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (20, 5, 10, 15)
    assert got["kappa"] == pytest.approx(0.4, abs=1e-9)


def _single_region_cells(spark, tmp_path, cells):
    _write_dims(
        spark,
        tmp_path,
        regions=[(0, "AMERICA")],
        nations=[(0, "US", 0)],
        customers=[(1, "c", 0, 0.0, "m")],
    )
    rows, ok = [], 0
    for exposed, outcome, cnt in cells:
        for _ in range(cnt):
            ok += 1
            rows.append(
                _order(
                    ok,
                    1,
                    LO,
                    1995,
                    prio="1-URGENT" if exposed else "3-MEDIUM",
                    status="F" if outcome else "O",
                )
            )
    _write_orders(spark, tmp_path, rows)


def test_odds_risk_hand_computed(spark, tmp_path):
    """a=10 b=20 c=5 d=40: OR = 400/100 = 4, RR = (10/30)/(5/45) = 3."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_odds_risk_by_region,
    )

    _single_region_cells(
        spark, tmp_path, [(1, 1, 10), (1, 0, 20), (0, 1, 5), (0, 0, 40)]
    )
    got = q_odds_risk_by_region(spark, str(tmp_path)).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (10, 20, 5, 40)
    assert row["odds_ratio"] == pytest.approx(4.0, abs=1e-9)
    assert row["risk_ratio"] == pytest.approx(3.0, abs=1e-9)


def test_mantel_haenszel_two_strata(spark, tmp_path):
    """Stratum AMERICA a=10 b=20 c=5 d=40 (n=75), EUROPE a=4 b=6 c=2
    d=8 (n=20): OR_MH = (400/75 + 32/20)/(100/75 + 12/20) = 3.586207."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_mantel_haenszel_or,
    )

    _write_dims(
        spark,
        tmp_path,
        regions=[(0, "AMERICA"), (1, "EUROPE")],
        nations=[(0, "US", 0), (1, "FR", 1)],
        customers=[(1, "c0", 0, 0.0, "m"), (2, "c1", 1, 0.0, "m")],
    )
    rows, ok = [], 0
    strata = {
        1: [(1, 1, 10), (1, 0, 20), (0, 1, 5), (0, 0, 40)],
        2: [(1, 1, 4), (1, 0, 6), (0, 1, 2), (0, 0, 8)],
    }
    for cust, cells in strata.items():
        for exposed, outcome, cnt in cells:
            for _ in range(cnt):
                ok += 1
                rows.append(
                    _order(
                        ok,
                        cust,
                        LO,
                        1995,
                        prio="1-URGENT" if exposed else "3-MEDIUM",
                        status="F" if outcome else "O",
                    )
                )
    _write_orders(spark, tmp_path, rows)
    got = q_mantel_haenszel_or(spark, str(tmp_path)).collect()[0]
    assert got["k"] == 2
    num = 400 / 75 + 32 / 20
    den = 100 / 75 + 12 / 20
    assert got["or_mh"] == pytest.approx(num / den, abs=1e-6)


def test_runs_test_alternating(spark, tmp_path):
    """Daily counts 1,2,1,2,1: diffs +,-,+,- -> R=4, n+=2, n-=2,
    z = (4 - 3)/sqrt(8*4/(16*3)) = 1.224745."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_runs_test_daily,
    )

    rows, ok = [], 0
    for day, cnt in enumerate([1, 2, 1, 2, 1], start=1):
        for _ in range(cnt):
            ok += 1
            rows.append(_order(ok, ok, LO, 1995, month=3, day=day))
    _write_orders(spark, tmp_path, rows)
    got = q_runs_test_daily(spark, str(tmp_path)).collect()[0]
    assert got["runs"] == 4
    assert got["n_plus"] == 2 and got["n_minus"] == 2
    assert got["z"] == pytest.approx(1 / math.sqrt(2 / 3), abs=1e-6)


def test_durbin_watson_linear_series(spark, tmp_path):
    """Daily revenue 1,2,3 cents: residuals -1,0,1 (scaled by n=3),
    DW = ((0-(-1))^2 + (1-0)^2) / (1+0+1) = 1.0."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline98 import (
        q_durbin_watson_daily,
    )

    rows, ok = [], 0
    for day, cents in enumerate([1, 2, 3], start=1):
        ok += 1
        rows.append(_order(ok, ok, cents / 100.0, 1995, month=3, day=day))
    _write_orders(spark, tmp_path, rows)
    got = q_durbin_watson_daily(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 3
    assert got["dw"] == pytest.approx(1.0, abs=1e-9)
