"""Unit tests for batch-110: exact distribution distances.

World: returned order values X = {1.00, 3.00}, kept Y = {2.00, 2.00}
— disjoint supports with a gap, giving closed forms: W1 = 1.00
dollars, two-sample CvM T = 0.1875, energy distance 1.00 dollars
(2*1 - 1 - 0), and TVD = 1 with the most divergent bin at the
Y-mass bin.
"""

from __future__ import annotations

import datetime as dt

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_world(spark, path, prices_flags):
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


_WORLD = [(1.00, "R"), (3.00, "R"), (2.00, "N"), (2.00, "N")]


def test_wasserstein1_closed_form(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_wasserstein1_returns,
    )

    _write_world(spark, tmp_path, _WORLD)
    r = q_wasserstein1_returns(spark, str(tmp_path)).collect()[0]
    assert (r.n_returned, r.n_kept) == (2, 2)
    assert abs(r.wasserstein1_dollars_6 - 1.0) <= 1e-9


def test_wasserstein1_identical_distributions_zero(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_wasserstein1_returns,
    )

    _write_world(
        spark, tmp_path, [(1.0, "R"), (2.0, "R"), (1.0, "N"), (2.0, "N")]
    )
    r = q_wasserstein1_returns(spark, str(tmp_path)).collect()[0]
    assert abs(r.wasserstein1_dollars_6 - 0.0) <= 1e-9


def test_cvm_closed_form(spark, tmp_path):
    """T = (n1*n2/N^2) * sum over pooled points of (F1-F2)^2
    = (4/16) * (0.25 + 0.25 + 0.25 + 0) = 0.1875."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_cvm_two_sample,
    )

    _write_world(spark, tmp_path, _WORLD)
    r = q_cvm_two_sample(spark, str(tmp_path)).collect()[0]
    assert r.n_pooled == 4
    assert abs(r.cvm_t_6 - 0.1875) <= 1e-9


def test_energy_distance_closed_form(spark, tmp_path):
    """E|X-Y| = 1.00, E|X-X'| = 2*200/4 cents = 1.00, E|Y-Y'| = 0
    -> energy = 2 - 1 - 0 = 1.00 dollars."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_energy_distance_returns,
    )

    _write_world(spark, tmp_path, _WORLD)
    r = q_energy_distance_returns(spark, str(tmp_path)).collect()[0]
    assert abs(r.mean_cross_dist_dollars_6 - 1.0) <= 1e-9
    assert abs(r.mean_within_x_dollars_6 - 1.0) <= 1e-9
    assert abs(r.mean_within_y_dollars_6 - 0.0) <= 1e-9
    assert abs(r.energy_distance_dollars_6 - 1.0) <= 1e-9


def test_tvd_disjoint_supports(spark, tmp_path):
    """Binning (x-100)*10 div 201 puts X mass in bins 0 and 9, Y mass
    in bin 4: TVD = 1, most divergent bin = 4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_tvd_decile_bins,
    )

    _write_world(spark, tmp_path, _WORLD)
    r = q_tvd_decile_bins(spark, str(tmp_path)).collect()[0]
    assert r.bins_present == 3
    assert abs(r.tvd_6 - 1.0) <= 1e-9
    assert r.max_divergence_bin == 4


def test_tvd_identical_distributions_zero(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_tvd_decile_bins,
    )

    _write_world(
        spark, tmp_path, [(1.0, "R"), (2.0, "R"), (1.0, "N"), (2.0, "N")]
    )
    r = q_tvd_decile_bins(spark, str(tmp_path)).collect()[0]
    assert abs(r.tvd_6 - 0.0) <= 1e-9
