"""Unit tests for batch-112: covariate balance & ordinal effects.

Hand worlds: a two-region SMD with closed-form pooled variances, QTE
decile gaps on two-point distributions, and Cliff's delta on both a
symmetric (delta 0) and a fully-separated (delta 1) pair of groups.
"""

from __future__ import annotations

import datetime as dt
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_labeled(spark, path, prices_flags):
    orows, lrows = [], []
    for i, (price, fl) in enumerate(prices_flags, start=1):
        orows.append((i, 1, "O", price, dt.datetime(1996, 3, 1), "3-MEDIUM"))
        lrows.append((i, 0.0, fl))
    spark.createDataFrame(orows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        lrows, "l_orderkey long, l_discount double, l_returnflag string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_smd_two_region_closed_form(spark, tmp_path):
    """Region A values [1.00, 3.00], region B [1.00, 5.00]:
    SMD_A = -100/sqrt((20000+80000)/2), var ratio 0.25."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline112 import (
        q_smd_balance_panel,
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
        (10, 1, "O", 1.00, dt.datetime(1996, 3, 1), "3-MEDIUM"),
        (11, 1, "O", 3.00, dt.datetime(1996, 3, 1), "3-MEDIUM"),
        (20, 2, "O", 1.00, dt.datetime(1996, 3, 1), "3-MEDIUM"),
        (21, 2, "O", 5.00, dt.datetime(1996, 3, 1), "3-MEDIUM"),
    ]
    spark.createDataFrame(orows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = {r.grp: r for r in q_smd_balance_panel(spark, str(tmp_path)).collect()}
    a = out["AMERICA"]
    assert a.n_orders == 2
    assert abs(a.group_mean_dollars_6 - 2.0) <= 1e-9
    smd = (200 - 300) / math.sqrt((20000 + 80000) / 2)
    assert abs(a.smd_6 - round(smd, 6)) <= 1e-9
    assert abs(a.variance_ratio_6 - 0.25) <= 1e-9
    assert bool(a.imbalanced_01) is True
    b = out["EUROPE"]
    assert abs(b.smd_6 - round(-smd, 6)) <= 1e-9
    assert abs(b.variance_ratio_6 - 4.0) <= 1e-9


def test_qte_decile_gaps_two_point(spark, tmp_path):
    """X = {1.00, 3.00}, Y = {2.00, 2.00}: q_x = 100 for d<=5 then
    300; q_y = 200 everywhere."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline112 import (
        q_qte_decile_gaps,
    )

    _write_labeled(
        spark, tmp_path, [(1.00, "R"), (3.00, "R"), (2.00, "N"), (2.00, "N")]
    )
    out = {r.decile: r for r in q_qte_decile_gaps(spark, str(tmp_path)).collect()}
    assert sorted(out) == list(range(1, 10))
    for d in range(1, 6):
        assert (out[d].q_returned_cents, out[d].q_kept_cents) == (100, 200)
        assert abs(out[d].qte_gap_dollars_6 - (-1.0)) <= 1e-9
    for d in range(6, 10):
        assert (out[d].q_returned_cents, out[d].q_kept_cents) == (300, 200)
        assert abs(out[d].qte_gap_dollars_6 - 1.0) <= 1e-9


def test_cliffs_delta_symmetric_zero(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline112 import (
        q_cliffs_delta_returns,
    )

    _write_labeled(
        spark, tmp_path, [(1.00, "R"), (3.00, "R"), (2.00, "N"), (2.00, "N")]
    )
    r = q_cliffs_delta_returns(spark, str(tmp_path)).collect()[0]
    assert (r.wins, r.losses) == (2, 2)
    assert abs(r.cliffs_delta_6 - 0.0) <= 1e-9
    assert r.magnitude == "negligible"


def test_cliffs_delta_fully_separated(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline112 import (
        q_cliffs_delta_returns,
    )

    _write_labeled(
        spark, tmp_path, [(3.00, "R"), (4.00, "R"), (1.00, "N"), (2.00, "N")]
    )
    r = q_cliffs_delta_returns(spark, str(tmp_path)).collect()[0]
    assert (r.wins, r.losses) == (4, 0)
    assert abs(r.cliffs_delta_6 - 1.0) <= 1e-9
    assert r.magnitude == "large"
