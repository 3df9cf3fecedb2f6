"""Unit tests for batch-103: time-series diagnostics.

Hand-computed examples: Mann–Kendall S on a strictly increasing
series (S = C(n,2), no-ties variance), turning points on a 5-point
zigzag, record highs/lows with the harmonic expectation, drawdown on
a peak-trough profile, monotone runs on a rise-fall-rise shape, and
mean crossings on an alternating series.
"""

from __future__ import annotations

import datetime as dt
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_monthly_series(spark, path, dollars):
    """One order per month (Jan 1996 onward), o_totalprice = series value."""
    rows = [
        (i, i, "O", v, dt.datetime(1996 + (i - 1) // 12, (i - 1) % 12 + 1, 5),
         "3-MEDIUM")
        for i, v in enumerate(dollars, start=1)
    ]
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def test_mann_kendall_increasing_series(spark, tmp_path):
    """[1,2,3,4]: S = 6 pairs all +1; varS = 4*3*13/18."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mann_kendall_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 2.0, 3.0, 4.0])
    r = q_mann_kendall_monthly(spark, str(tmp_path)).collect()[0]
    assert r.n_months == 4 and r.s_stat == 6
    var_s = 4 * 3 * 13 / 18
    assert abs(r.var_s_6 - round(var_s, 6)) <= 1e-9
    assert abs(r.z_6 - round((6 - 1) / math.sqrt(var_s), 6)) <= 1e-9


def test_mann_kendall_tie_correction(spark, tmp_path):
    """[1,1,2]: S = 2 (one tie pair is 0); tie group t=2 subtracts
    2*1*9 = 18 from 3*2*11 = 66."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mann_kendall_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 1.0, 2.0])
    r = q_mann_kendall_monthly(spark, str(tmp_path)).collect()[0]
    assert r.s_stat == 2
    assert abs(r.var_s_6 - round((66 - 18) / 18, 6)) <= 1e-9


def test_turning_points_zigzag(spark, tmp_path):
    """[1,3,2,4,3]: interior months 3,2,4 are all strict extrema."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_turning_points_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 3.0, 2.0, 4.0, 3.0])
    r = q_turning_points_monthly(spark, str(tmp_path)).collect()[0]
    assert r.n_months == 5 and r.turning_points == 3
    assert abs(r.expected_6 - round(2 * 3 / 3.0, 6)) <= 1e-9
    var = (16 * 5 - 29) / 90.0
    assert abs(r.variance_6 - round(var, 6)) <= 1e-9
    assert abs(r.z_6 - round((3 - 2.0) / math.sqrt(var), 6)) <= 1e-9


def test_record_months_and_harmonic(spark, tmp_path):
    """[2,1,3,0.5]: highs = {m1, m3}, lows = {m1, m2, m4};
    H_4 = 1 + 1/2 + 1/3 + 1/4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_record_months_monthly,
    )

    _write_monthly_series(spark, tmp_path, [2.0, 1.0, 3.0, 0.5])
    r = q_record_months_monthly(spark, str(tmp_path)).collect()[0]
    assert (r.n_months, r.record_highs, r.record_lows) == (4, 2, 3)
    h4 = sum(round(1.0 / i, 6) for i in range(1, 5))
    assert abs(r.expected_records_6 - round(h4, 6)) <= 1e-9


def test_drawdown_peak_trough(spark, tmp_path):
    """[5,3,6,2]: draws [0,2,0,4]; max 4 at month 4 against peak 6."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_revenue_drawdown_monthly,
    )

    _write_monthly_series(spark, tmp_path, [5.0, 3.0, 6.0, 2.0])
    r = q_revenue_drawdown_monthly(spark, str(tmp_path)).collect()[0]
    assert r.n_months == 4
    assert r.max_drawdown_cents == 400
    assert r.trough_month_key == 1996 * 12 + 4
    assert r.peak_cents == 600
    assert abs(r.drawdown_share_6 - round(400 / 600, 6)) <= 1e-9


def test_drawdown_tie_breaks_to_earliest_trough(spark, tmp_path):
    """[5,2,5,2]: draw 3 at months 2 and 4 -> earliest month wins."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_revenue_drawdown_monthly,
    )

    _write_monthly_series(spark, tmp_path, [5.0, 2.0, 5.0, 2.0])
    r = q_revenue_drawdown_monthly(spark, str(tmp_path)).collect()[0]
    assert r.max_drawdown_cents == 300
    assert r.trough_month_key == 1996 * 12 + 2


def test_monotone_runs_rise_fall(spark, tmp_path):
    """[1,2,3,2,1,0,5]: up-steps at m2,m3 (run 2) and m7 (run 1);
    down-steps at m4,m5,m6 (run 3)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_monotone_runs_monthly,
    )

    _write_monthly_series(
        spark, tmp_path, [1.0, 2.0, 3.0, 2.0, 1.0, 0.5, 5.0]
    )
    r = q_monotone_runs_monthly(spark, str(tmp_path)).collect()[0]
    assert (r.n_months, r.longest_up_steps, r.longest_down_steps) == (7, 2, 3)


def test_monotone_runs_flat_series(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_monotone_runs_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 1.0, 1.0])
    r = q_monotone_runs_monthly(spark, str(tmp_path)).collect()[0]
    assert (r.longest_up_steps, r.longest_down_steps) == (0, 0)


def test_mean_crossings_alternating(spark, tmp_path):
    """[1,5,1,5]: mean 3, signs [-,+,-,+] -> 3 crossings."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mean_crossings_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 5.0, 1.0, 5.0])
    r = q_mean_crossings_monthly(spark, str(tmp_path)).collect()[0]
    assert (r.n_months, r.n_above, r.n_below, r.n_equal) == (4, 2, 2, 0)
    assert r.crossings == 3


def test_mean_crossings_equal_months_not_crossings(spark, tmp_path):
    """[1,3,5]: mean 3 -> signs [-,0,+]; a through-zero path is NOT a
    strict flip (sgn*prev = -1 never holds)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mean_crossings_monthly,
    )

    _write_monthly_series(spark, tmp_path, [1.0, 3.0, 5.0])
    r = q_mean_crossings_monthly(spark, str(tmp_path)).collect()[0]
    assert (r.n_above, r.n_below, r.n_equal) == (1, 1, 1)
    assert r.crossings == 0
