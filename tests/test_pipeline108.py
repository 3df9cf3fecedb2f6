"""Unit tests for batch-108: conformal prediction & forecast scoring.

Each test mirrors the query in pure Python — including the portable
48-bit md5 split (hashlib twin of sampling.portable_fraction) and the
6-dp scaled term sums — on a small deterministic world, pinning the
nearest-rank selection, the coverage counting and the loss algebra.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _frac(key, salt="conf"):
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:12]
    return int(h, 16) / float(1 << 48)


def _write_orders(spark, path, rows):
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def _world(spark, path, n=40, priorities=("3-MEDIUM",)):
    rows = [
        (
            i,
            i,
            "O",
            float(i),
            dt.datetime(1996, 3, 1),
            priorities[i % len(priorities)],
        )
        for i in range(1, n + 1)
    ]
    _write_orders(spark, path, rows)
    return rows


def _py_split_scores(rows):
    """Python mirror: per-priority calibration mean, |x - mean| scores."""
    cal = [(k, g, p * 100) for k, _, _, p, _, g in rows if _frac(k) < 0.5]
    test = [(k, g, p * 100) for k, _, _, p, _, g in rows if _frac(k) >= 0.5]
    model = {}
    for _, g, x in cal:
        s, n = model.get(g, (0, 0))
        model[g] = (s + x, n + 1)
    mean = {g: s / n for g, (s, n) in model.items()}
    cal_scores = sorted(
        (abs(x - mean[g]), k) for k, g, x in cal if g in mean
    )
    test_scores = [(abs(x - mean[g]), k) for k, g, x in test if g in mean]
    return cal_scores, test_scores, mean


def test_conformal_coverage_matches_python_mirror(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline108 import (
        q_conformal_split_coverage,
    )

    rows = _world(spark, tmp_path, n=40)
    cal, test, _ = _py_split_scores(rows)
    nc = len(cal)
    kk = min(math.ceil((nc + 1) * 0.9), nc)
    qhat = cal[kk - 1][0]
    covered = sum(1 for s, _ in test if s <= qhat)
    r = q_conformal_split_coverage(spark, str(tmp_path)).collect()[0]
    assert (r.n_calibration, r.n_test) == (nc, len(test))
    assert abs(r.q_hat_6 - round(qhat, 6)) <= 1e-9
    assert r.covered == covered
    assert abs(r.coverage_6 - round(covered / len(test), 6)) <= 1e-9


def test_quantile_calibration_levels(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline108 import (
        q_quantile_calibration_report,
    )

    rows = _world(spark, tmp_path, n=40)
    cal, test, _ = _py_split_scores(rows)
    nc, nt = len(cal), len(test)
    out = {r.level: r for r in q_quantile_calibration_report(spark, str(tmp_path)).collect()}
    assert sorted(out) == [0.5, 0.75, 0.9, 0.95, 0.99]
    for lv in (0.5, 0.9):
        kk = min(math.ceil((nc + 1) * lv), nc)
        q = cal[kk - 1][0]
        cov = sum(1 for s, _ in test if s <= q)
        assert abs(out[lv].q_level_6 - round(q, 6)) <= 1e-9
        assert abs(out[lv].empirical_coverage_6 - round(cov / nt, 6)) <= 1e-9


def test_winkler_score_mirror(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline108 import (
        q_winkler_interval_score,
    )

    rows = _world(spark, tmp_path, n=40)
    cal, test, _ = _py_split_scores(rows)
    nc = len(cal)
    kk = min(math.ceil((nc + 1) * 0.8), nc)
    q = cal[kk - 1][0]
    t6 = [round(round(2.0 * q + 10.0 * max(s - q, 0.0), 6) * 1e6) for s, _ in test]
    outside = sum(1 for s, _ in test if s > q)
    r = q_winkler_interval_score(spark, str(tmp_path)).collect()[0]
    assert r.n_test == len(test)
    assert abs(r.half_width_6 - round(q, 6)) <= 1e-9
    assert r.n_outside == outside
    assert abs(r.mean_winkler_6 - round(sum(t6) / 1e6 / len(test), 6)) <= 1e-9


def test_pinball_q90_two_groups(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline108 import (
        q_pinball_loss_q90,
    )

    rows = _world(spark, tmp_path, n=40, priorities=("1-URGENT", "5-LOW"))
    # python mirror
    cal = [(k, g, p * 100) for k, _, _, p, _, g in rows if _frac(k) < 0.5]
    test = [(k, g, p * 100) for k, _, _, p, _, g in rows if _frac(k) >= 0.5]
    out = {r.o_orderpriority: r for r in q_pinball_loss_q90(spark, str(tmp_path)).collect()}
    for g in ("1-URGENT", "5-LOW"):
        xs = sorted((x, k) for k, gg, x in cal if gg == g)
        ng = len(xs)
        q = xs[min(math.ceil(ng * 0.9), ng) - 1][0]
        ts = [
            round(round(max(0.9 * (x - q), 0.1 * (q - x)), 6) * 1e6)
            for k, gg, x in test
            if gg == g
        ]
        r = out[g]
        assert r.n_test == len(ts)
        assert r.q90_cents == int(q)
        assert abs(r.mean_pinball_6 - round(sum(ts) / 1e6 / len(ts), 6)) <= 1e-9
