"""Unit tests for batch-95: exact classical statistics suite 2.

Known-value checks on textbook examples (per round-4 verdict item 5):
ANOVA F on a 3-group example with a hand-computable F, Cramér's V on a
2x2 table with known phi^2, Theil–Sen on a 5-point series where one
outlier month must not move the slope, WoE/IV with ln(3) closed form,
plus a pre-1970 regression test for the floor-division ISO-weekday fix.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_orders(spark, path, rows):
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def _write_customer(spark, path, rows):
    spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_anova_f_textbook_3group(spark, tmp_path):
    """Groups [1,2,3] [2,3,4] [3,4,5]: SSB=6, SSW=6, F=(6/2)/(6/6)=3."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import q_anova_f_oneway

    rows = []
    eid = 0
    for g, vals in [("a", [1, 2, 3]), ("b", [2, 3, 4]), ("c", [3, 4, 5])]:
        for v in vals:
            eid += 1
            rows.append(
                (eid, dt.datetime(2020, 1, 1, eid), eid, g, float(v), "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = q_anova_f_oneway(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == 3 and r.n == 9
    assert r.ssb == pytest.approx(6.0, abs=1e-6)
    assert r.ssw == pytest.approx(6.0, abs=1e-6)
    assert r.f_stat == pytest.approx(3.0, abs=1e-6)


def test_cramers_v_2x2_known_phi(spark, tmp_path):
    """2x2 counts [[10,30],[30,10]]: chi2 = n(ad-bc)^2/(r1 r2 c1 c2) = 20,
    V = sqrt(20 / (80 * 1)) = 0.5."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import q_cramers_v_pairs

    d = dt.datetime(1995, 6, 1)
    rows, key = [], 0
    for prio, status, cnt in [
        ("1-URGENT", "F", 10), ("1-URGENT", "O", 30),
        ("2-HIGH", "F", 30), ("2-HIGH", "O", 10),
    ]:
        for _ in range(cnt):
            key += 1
            rows.append((key, key, status, 100.0, d, prio))
    _write_orders(spark, tmp_path, rows)
    # events side of the query needs to exist; 2 rows, separate output row
    _write_events(
        spark, tmp_path,
        [(1, dt.datetime(2020, 1, 6), 1, "x", 1.0, "{}"),
         (2, dt.datetime(2020, 1, 7), 1, "y", 1.0, "{}")],
    )
    out = {r.pair: r for r in q_cramers_v_pairs(spark, str(tmp_path)).collect()}
    r = out["priority_x_status"]
    assert r.n == 80 and r.n_rows == 2 and r.n_cols == 2
    assert r.chi2 == pytest.approx(20.0, abs=1e-6)
    assert r.cramers_v == pytest.approx(0.5, abs=1e-6)


def test_theil_sen_ignores_outlier_month(spark, tmp_path):
    """Monthly cents 100,200,10000,400,500: 8 of 10 pairwise slopes are
    100; the nearest-rank-lower median is 100 despite the m3 outlier
    (OLS slope on the same data is ~ -396)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import q_theil_sen_slope

    _write_customer(spark, tmp_path, [(1, "c1", 7, 10.0, "BUILDING")])
    prices = {1: 1.0, 2: 2.0, 3: 100.0, 4: 4.0, 5: 5.0}
    _write_orders(
        spark, tmp_path,
        [(m, 1, "O", p, dt.datetime(1992, m, 15), "3-MEDIUM")
         for m, p in prices.items()],
    )
    out = q_theil_sen_slope(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.nation == 7 and r.n_pairs == 10
    assert r.slope_cents_per_month == pytest.approx(100.0, abs=1e-6)


def test_woe_iv_closed_form(spark, tmp_path):
    """Buckets X(good=30,bad=10) Y(good=10,bad=30), G=B=40:
    woe_X = ln(3), iv_X = 0.5*ln(3); Y mirrors with the opposite sign."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import q_woe_iv_report

    d = dt.datetime(1994, 3, 1)
    rows, key = [], 0
    for prio, status, cnt in [
        ("X", "O", 30), ("X", "F", 10), ("Y", "O", 10), ("Y", "F", 30),
    ]:
        for _ in range(cnt):
            key += 1
            rows.append((key, key, status, 50.0, d, prio))
    _write_orders(spark, tmp_path, rows)
    out = {r.bucket: r for r in q_woe_iv_report(spark, str(tmp_path)).collect()}
    ln3 = math.log(3.0)
    assert out["X"].good_i == 30 and out["X"].bad_i == 10
    assert out["X"].woe == pytest.approx(ln3, abs=1e-6)
    assert out["X"].iv_term == pytest.approx(0.5 * ln3, abs=1e-6)
    assert out["Y"].woe == pytest.approx(-ln3, abs=1e-6)
    assert out["Y"].iv_term == pytest.approx(0.5 * ln3, abs=1e-6)


def test_iso_weekday_floor_division_pre_epoch(spark):
    """The pmod/floor-div epoch-day expression (ADVICE r4, q_pipeline95)
    must agree with calendar ISO weekday for pre-1970 timestamps, where
    trunc-div `div` would round the epoch day toward zero."""
    # 1969-12-31 (Wed, isodow 3) 12:00 UTC = -43_200_000_000 us;
    # 1969-12-28 (Sun, isodow 7); 2026-08-14 (Fri, isodow 5)
    cases = [
        (-43_200_000_000, 3),
        (int((dt.datetime(1969, 12, 28) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6), 7),
        (int((dt.datetime(2026, 8, 14) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6), 5),
    ]
    df = spark.createDataFrame([(us,) for us, _ in cases], ["ts_us"])
    got = df.select(
        "ts_us",
        (
            F.pmod(
                F.expr("(ts_us - pmod(ts_us, 86400000000)) div 86400000000") + 3,
                F.lit(7),
            ) + 1
        ).alias("isodow"),
    ).collect()
    want = dict(cases)
    for r in got:
        assert r.isodow == want[r.ts_us], r


def test_acf_matches_numpy(spark):
    """Independent recomputation: ACF at lags 1..7 of the sf0.001 daily
    revenue series via pure-python centered cross-products."""
    import duckdb

    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import q_acf_lags_exact

    series = [
        r[0] for r in duckdb.sql(
            f"""SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
            FROM '{SF}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE) ORDER BY CAST(o_orderdate AS DATE)"""
        ).fetchall()
    ]
    n = len(series)
    mean = sum(series) / n
    den = sum((x - mean) ** 2 for x in series)
    out = {r.lag: r for r in q_acf_lags_exact(spark, SF).collect()}
    assert set(out) == set(range(1, 8))
    for lag in range(1, 8):
        num = sum(
            (series[i] - mean) * (series[i + lag] - mean) for i in range(n - lag)
        )
        assert out[lag].n_pairs == n - lag
        assert out[lag].acf == pytest.approx(num / den, abs=1e-5)


def test_calibration_bins_invariants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline95 import (
        q_calibration_bins_report,
    )

    rows = q_calibration_bins_report(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert [r.bin for r in rows] == sorted(r.bin for r in rows)
    assert all(0 <= r.bin <= 9 for r in rows)
    assert sum(r.n for r in rows) == n_cust
    for r in rows:
        assert 0.0 <= r.mean_pred <= 1.0 and 0.0 <= r.obs_rate <= 1.0
        assert r.gap == pytest.approx(abs(r.mean_pred - r.obs_rate), abs=2e-6)
        # decile bins: mean predicted score lands inside its own bin
        assert r.bin / 10.0 - 1e-6 <= r.mean_pred <= (r.bin + 1) / 10.0 + 1e-6
