"""Unit tests for batch-105: exact classifier evaluation.

A 4-order scenario with one tied-score pair pins every statistic to
a hand value: scores (in percent) [10, 5, 5, 0] with labels
[1, 1, 0, 0] give AUC = 0.875 via the tie-averaged rank identity,
Brier 0.125 with a zero-reliability Murphy decomposition, and a
confusion matrix (2,1,0,1) at the s>=5 threshold.
"""

from __future__ import annotations

import math


def _write_model_world(spark, path, rows, orders=None):
    """rows: (orderkey, discount, returnflag)."""
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_returnflag string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    if orders is not None:
        import datetime as dt

        spark.createDataFrame(
            [
                (ok, 1, "O", price, dt.datetime(1996, 3, 1), "3-MEDIUM")
                for ok, price in orders
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


_ROWS = [
    (1, 0.10, "R"),  # s=10, y=1
    (2, 0.05, "R"),  # s=5,  y=1
    (3, 0.05, "N"),  # s=5,  y=0
    (4, 0.00, "N"),  # s=0,  y=0
]


def test_auc_tie_averaged(spark, tmp_path):
    """Pairs: A>C, A>D, B>D win; B-C ties -> AUC = 3.5/4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_auc_exact_rank,
    )

    _write_model_world(spark, tmp_path, _ROWS)
    r = q_auc_exact_rank(spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert abs(r.auc_6 - 0.875) <= 1e-9
    assert abs(r.gini_6 - 0.75) <= 1e-9


def test_brier_murphy_closed_form(spark, tmp_path):
    """Brier = 0.125; within-cell rates equal predictions => REL = 0;
    RES = 0.125; UNC = 0.25 (BS = REL - RES + UNC)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_brier_murphy_decomposition,
    )

    _write_model_world(spark, tmp_path, _ROWS)
    r = q_brier_murphy_decomposition(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 4
    assert abs(r.brier_6 - 0.125) <= 1e-9
    assert abs(r.reliability_6 - 0.0) <= 1e-9
    assert abs(r.resolution_6 - 0.125) <= 1e-9
    assert abs(r.uncertainty_6 - 0.25) <= 1e-9


def test_threshold_metrics_hand_confusion(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_threshold_metrics_exact,
    )

    _write_model_world(spark, tmp_path, _ROWS)
    r = q_threshold_metrics_exact(spark, str(tmp_path)).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 0, 1)
    assert abs(r.f1_6 - 0.8) <= 1e-9
    assert abs(r.balanced_acc_6 - 0.75) <= 1e-9
    assert abs(r.youden_j_6 - 0.5) <= 1e-9
    assert abs(r.mcc_6 - round(2 / math.sqrt(12), 6)) <= 1e-9


def test_cohens_d_pooled_sd(spark, tmp_path):
    """Returned x = [3.00, 3.00], kept x = [1.00, 2.00] dollars:
    mdiff = 150 cents, pooled sd = 50 -> d = 3, g = 3*(1 - 3/7)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_cohens_d_order_value,
    )

    rows = [(1, 0.0, "R"), (2, 0.0, "R"), (3, 0.0, "N"), (4, 0.0, "N")]
    orders = [(1, 3.00), (2, 3.00), (3, 1.00), (4, 2.00)]
    _write_model_world(spark, tmp_path, rows, orders=orders)
    r = q_cohens_d_order_value(spark, str(tmp_path)).collect()[0]
    assert (r.n_returned, r.n_kept) == (2, 2)
    assert abs(r.cohens_d_6 - 3.0) <= 1e-9
    assert abs(r.hedges_g_6 - round(3.0 * (1 - 3 / 7), 6)) <= 1e-9


def test_cumulative_gains_descending(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_cumulative_gains_by_score,
    )

    _write_model_world(spark, tmp_path, _ROWS)
    out = {r.score_pct: r for r in q_cumulative_gains_by_score(spark, str(tmp_path)).collect()}
    assert sorted(out) == [0, 5, 10]
    assert (out[10].cum_orders, out[10].cum_positives) == (1, 1)
    assert abs(out[10].gain_6 - 0.5) <= 1e-9
    assert abs(out[10].lift_6 - 2.0) <= 1e-9
    assert (out[5].cum_orders, out[5].cum_positives) == (3, 2)
    assert abs(out[5].lift_6 - round(8 / 6, 6)) <= 1e-9
    assert (out[0].cum_orders, out[0].cum_positives) == (4, 2)
    assert abs(out[0].lift_6 - 1.0) <= 1e-9
