"""Unit tests for batch-109: sequential testing & forecast baselines.

Hand series: an all-returned month crosses the SPRT upper boundary in
one step (LLR = 0.200671 * 2k - n exactly), a level-shifted revenue
series pins the Page-Hinkley excursion algebra (m_n = 0 identity),
Beta(1,1) posteriors have closed forms, and a doubling series gives
exact naive MAE/RMSE with a NULL seasonal panel under 13 months.
"""

from __future__ import annotations

import datetime as dt
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_orders(spark, path, rows):
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_returnflag string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _month_orders(spark, path, per_month_flags):
    """per_month_flags: list (per month, starting 1996-01) of lists of
    returnflags; one order per flag, price 1.00."""
    orows, lrows, ok = [], [], 0
    for mi, flags in enumerate(per_month_flags):
        for fl in flags:
            ok += 1
            orows.append(
                (ok, 1, "O", 1.0, dt.datetime(1996, mi + 1, 5), "3-MEDIUM")
            )
            lrows.append((ok, 0.0, fl))
    _write_orders(spark, path, orows)
    _write_lineitem(spark, path, lrows)


def test_sprt_accepts_h1_on_all_returned(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_sprt_monthly_decision,
    )

    _month_orders(spark, tmp_path, [["R"] * 20])
    r = q_sprt_monthly_decision(spark, str(tmp_path)).collect()[0]
    assert r.decision == "accept_h1"
    assert r.decision_month_key == 1996 * 12 + 1
    assert abs(r.llr_at_decision_6 - round(0.200671 * 20, 6)) <= 1e-9


def test_sprt_accepts_h0_on_none_returned(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_sprt_monthly_decision,
    )

    _month_orders(spark, tmp_path, [["N"] * 20])
    r = q_sprt_monthly_decision(spark, str(tmp_path)).collect()[0]
    assert r.decision == "accept_h0"
    assert abs(r.llr_at_decision_6 - round(-0.200671 * 20, 6)) <= 1e-9


def test_sprt_continues_on_balance(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_sprt_monthly_decision,
    )

    _month_orders(spark, tmp_path, [["R", "N"], ["R", "N"]])
    r = q_sprt_monthly_decision(spark, str(tmp_path)).collect()[0]
    assert r.decision == "continue"
    assert r.decision_month_key == 1996 * 12 + 2
    assert abs(r.llr_at_decision_6 - 0.0) <= 1e-9


def _monthly_prices(spark, path, dollars):
    rows = [
        (i, 1, "O", v, dt.datetime(1996 + (i - 1) // 12, (i - 1) % 12 + 1, 5),
         "3-MEDIUM")
        for i, v in enumerate(dollars, start=1)
    ]
    _write_orders(spark, path, rows)


def test_page_hinkley_level_shift(spark, tmp_path):
    """[1,1,1,101] dollars: m_t scaled = [-1e4,-2e4,-3e4,0]; max
    excursion 30000/4 cents = 75 dollars, no alarm."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_page_hinkley_monthly,
    )

    _monthly_prices(spark, tmp_path, [1.0, 1.0, 1.0, 101.0])
    r = q_page_hinkley_monthly(spark, str(tmp_path)).collect()[0]
    assert r.n_months == 4
    assert r.peak_month_key == 1996 * 12 + 4
    assert abs(r.max_excursion_dollars_6 - 75.0) <= 1e-9
    assert bool(r.alarm) is False


def test_page_hinkley_alarm_fires(spark, tmp_path):
    """[1,1,1,10000]: mean excursion (3*1e6 - 300)/4 cents = 7499.25
    dollars > 5000 -> alarm."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_page_hinkley_monthly,
    )

    _monthly_prices(spark, tmp_path, [1.0, 1.0, 1.0, 10000.0])
    r = q_page_hinkley_monthly(spark, str(tmp_path)).collect()[0]
    assert abs(r.max_excursion_dollars_6 - 7499.25) <= 1e-9
    assert bool(r.alarm) is True


def test_beta_binomial_closed_form(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_beta_binomial_by_region,
    )

    spark.createDataFrame(
        [(0, "AMERICA"), (1, "EUROPE")], "r_regionkey long, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/region.parquet")
    spark.createDataFrame(
        [(0, 0), (1, 1)], "n_nationkey long, n_regionkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    orows = [
        (10, 1, "O", 1.0, dt.datetime(1996, 1, 5), "3-MEDIUM"),
        (11, 1, "O", 1.0, dt.datetime(1996, 1, 5), "3-MEDIUM"),
        (12, 1, "O", 1.0, dt.datetime(1996, 1, 5), "3-MEDIUM"),
        (13, 1, "O", 1.0, dt.datetime(1996, 1, 5), "3-MEDIUM"),
        (20, 2, "O", 1.0, dt.datetime(1996, 1, 5), "3-MEDIUM"),
    ]
    _write_orders(spark, tmp_path, orows)
    _write_lineitem(
        spark,
        tmp_path,
        [(10, 0.0, "R"), (11, 0.0, "N"), (12, 0.0, "N"), (13, 0.0, "N"),
         (20, 0.0, "R")],
    )
    out = {r.grp: r for r in q_beta_binomial_by_region(spark, str(tmp_path)).collect()}
    a = out["AMERICA"]
    assert (a.n_orders, a.k_returned) == (4, 1)
    assert abs(a.mle_6 - 0.25) <= 1e-9
    assert abs(a.posterior_mean_6 - round(2 / 6, 6)) <= 1e-9
    assert abs(a.posterior_var_6 - round(2 * 4 / (36 * 7), 6)) <= 1e-9
    assert abs(a.shrinkage_6 - round(2 / 6 - 0.25, 6)) <= 1e-9
    b = out["EUROPE"]
    assert abs(b.posterior_mean_6 - round(2 / 3, 6)) <= 1e-9


def test_mase_doubling_series_no_seasonal(spark, tmp_path):
    """[1,2,4,8]: naive AE = [1,2,4] dollars; 13-month seasonal panel
    absent -> NULLs."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_forecast_error_mase,
    )

    _monthly_prices(spark, tmp_path, [1.0, 2.0, 4.0, 8.0])
    r = q_forecast_error_mase(spark, str(tmp_path)).collect()[0]
    assert (r.n_naive, r.n_seasonal) == (3, 0)
    assert abs(r.naive_mae_dollars_6 - round(7 / 3, 6)) <= 1e-9
    rmse = math.sqrt((100**2 + 200**2 + 400**2) / 3) / 100
    assert abs(r.naive_rmse_dollars_6 - round(rmse, 6)) <= 1e-9
    assert r.seasonal_mae_dollars_6 is None
    assert r.seasonal_vs_naive_mase_6 is None


def test_mase_with_seasonal_lag(spark, tmp_path):
    """14 months of i dollars: seasonal AE = 12 dollars at months
    13-14; naive AE = 1 -> MASE 12."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline109 import (
        q_forecast_error_mase,
    )

    _monthly_prices(spark, tmp_path, [float(i) for i in range(1, 15)])
    r = q_forecast_error_mase(spark, str(tmp_path)).collect()[0]
    assert (r.n_naive, r.n_seasonal) == (13, 2)
    assert abs(r.naive_mae_dollars_6 - 1.0) <= 1e-9
    assert abs(r.seasonal_mae_dollars_6 - 12.0) <= 1e-9
    assert abs(r.seasonal_vs_naive_mase_6 - 12.0) <= 1e-9
