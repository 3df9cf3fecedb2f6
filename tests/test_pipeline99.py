"""Unit tests for batch-99: exact moments & shape statistics.

Known-value checks: textbook skewness/kurtosis on [2,4,4,4,5,5,7,9],
Jarque–Bera from those moments, Bowley on a hand-ranked 5-point set,
Yule's Q = 7/9 on a hand 2x2, trimmed mean with whole and partial tie
blocks, Grubbs on a planted outlier.
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


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(
        rows, ["l_orderkey", "l_discount", "l_returnflag"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _orders_from_cents(cents_list):
    return [
        (i, i, "O", c / 100.0, dt.datetime(1995, 6, 1), "3-MEDIUM")
        for i, c in enumerate(cents_list, start=1)
    ]


# the classic moments sample: mean 5, m2 = 4, m3 = 5.25, m4 = 44.5
SAMPLE = [2, 4, 4, 4, 5, 5, 7, 9]
G1 = 5.25 / 8.0
G2 = 44.5 / 16.0 - 3.0


def test_skewness_kurtosis_textbook(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_skewness_kurtosis_exact,
    )

    _write_orders(spark, tmp_path, _orders_from_cents(SAMPLE))
    got = q_skewness_kurtosis_exact(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 8
    assert got["skewness"] == pytest.approx(G1, abs=1e-6)
    assert got["excess_kurtosis"] == pytest.approx(G2, abs=1e-6)


def test_jarque_bera_from_moments(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_jarque_bera_stat,
    )

    _write_orders(spark, tmp_path, _orders_from_cents(SAMPLE))
    got = q_jarque_bera_stat(spark, str(tmp_path)).collect()[0]
    assert got["g1"] == pytest.approx(G1, abs=1e-6)
    assert got["g2"] == pytest.approx(G2, abs=1e-6)
    assert got["jb"] == pytest.approx(
        8 / 6 * (G1 * G1 + G2 * G2 / 4), abs=1e-5
    )


def test_bowley_hand_ranked(spark, tmp_path):
    """[1,2,2,3,10]: type-1 q1=2 (ce>=2), q2=2 (ce>=3), q3=3 (ce>=4)
    -> (3 + 2 - 4)/(3 - 2) = 1.0."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_bowley_quartile_skew,
    )

    _write_orders(spark, tmp_path, _orders_from_cents([1, 2, 2, 3, 10]))
    got = q_bowley_quartile_skew(spark, str(tmp_path)).collect()[0]
    assert (got["q1_cents"], got["q2_cents"], got["q3_cents"]) == (2, 2, 3)
    assert got["bowley_skew"] == pytest.approx(1.0, abs=1e-9)


def test_yules_q_hand_2x2(spark, tmp_path):
    """a=10 b=5 c=2 d=8: Q = (80-10)/(80+10) = 7/9."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_yules_q_discount_return,
    )

    rows, lk = [], 0
    for e, o, cnt in [(1, 1, 10), (1, 0, 5), (0, 1, 2), (0, 0, 8)]:
        for _ in range(cnt):
            lk += 1
            rows.append((lk, 0.10 if e else 0.0, "R" if o else "N"))
    _write_lineitem(spark, tmp_path, rows)
    got = q_yules_q_discount_return(spark, str(tmp_path)).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (10, 5, 2, 8)
    assert got["yules_q"] == pytest.approx(7 / 9, abs=1e-6)


def test_trimmed_mean_simple(spark, tmp_path):
    """1..10 cents, trim floor(10/10)=1 each side: mean(2..9) = 5.5
    cents = 0.055 dollars."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_trimmed_mean_orders,
    )

    _write_orders(spark, tmp_path, _orders_from_cents(list(range(1, 11))))
    got = q_trimmed_mean_orders(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 10 and got["trimmed_each"] == 1
    assert got["trimmed_mean_dollars"] == pytest.approx(0.055, abs=1e-9)


def test_trimmed_mean_partial_tie_blocks(spark, tmp_path):
    """[1,1,1,2,3,3,3,3,10,10] trim 1 each side: drop ONE 1 and ONE 10
    -> (2*1 + 2 + 4*3 + 10)/8 = 3.25 cents; exercises the partial
    boundary-block arithmetic."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_trimmed_mean_orders,
    )

    _write_orders(
        spark, tmp_path, _orders_from_cents([1, 1, 1, 2, 3, 3, 3, 3, 10, 10])
    )
    got = q_trimmed_mean_orders(spark, str(tmp_path)).collect()[0]
    assert got["trimmed_each"] == 1
    assert got["trimmed_mean_dollars"] == pytest.approx(0.0325, abs=1e-9)


def test_grubbs_planted_outlier(spark, tmp_path):
    """[1,2,3,4,100]: maxdev = |5*100 - 110| = 390,
    G = 390/sqrt(5*(5*10030 - 110^2)/4) = 1.788256."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_grubbs_max_outlier,
    )

    _write_orders(spark, tmp_path, _orders_from_cents([1, 2, 3, 4, 100]))
    got = q_grubbs_max_outlier(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 5
    assert got["max_scaled_dev"] == 390
    assert got["g"] == pytest.approx(
        390 / math.sqrt(5 * (5 * 10030 - 110 * 110) / 4), abs=1e-6
    )
