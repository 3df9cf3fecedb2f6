"""Unit tests for batch-107: ranking comparison & evaluation.

Hand-built rankings: 6 orders with scores [10,9,8,7,6,5] (no ties, so
positions are explicit) and labels [1,0,1,0,0,1] give
AP@10 = (1/1 + 2/3 + 3/6)/3; a reversed value ranking pins Kendall
distance = 1 and truncated RBO to the closed geometric form.
"""

from __future__ import annotations

import math


def _write_rank_world(spark, path, rows, orders=None):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    df = pd.DataFrame(
        rows, columns=["l_orderkey", "l_discount", "l_returnflag"]
    )
    pq.write_table(pa.Table.from_pandas(df), f"{path}/lineitem.parquet")
    if orders is not None:
        spark.createDataFrame(
            [
                (ok, 1, "O", price, dt.datetime(1996, 3, 1), "3-MEDIUM")
                for ok, price in orders
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


# scores 10..5 by orderkey 1..6; labels 1,0,1,0,0,1
_LINES = [
    (1, 0.10, "R"),
    (2, 0.09, "N"),
    (3, 0.08, "R"),
    (4, 0.07, "N"),
    (5, 0.06, "N"),
    (6, 0.05, "R"),
]


def test_map_at_10_hand_ap(spark, tmp_path):
    """Hits at positions 1, 3, 6 -> AP = (1 + 2/3 + 1/2) / 3."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        q_map_at_10_exact,
    )

    _write_rank_world(spark, tmp_path, _LINES)
    r = q_map_at_10_exact(spark, str(tmp_path)).collect()[0]
    assert (r.n_relevant_total, r.relevant_in_top10) == (3, 3)
    ap = (
        round(1 / 1, 9) + round(2 / 3, 9) + round(3 / 6, 9)
    ) / 3
    assert abs(r.ap_at_10_6 - round(ap, 6)) <= 1e-9


def test_precision_recall_at_k_curve(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        q_precision_recall_at_k,
    )

    _write_rank_world(spark, tmp_path, _LINES)
    out = {r.k: r for r in q_precision_recall_at_k(spark, str(tmp_path)).collect()}
    assert sorted(out) == [1, 5, 10, 20, 50]
    assert out[1].hits == 1
    assert abs(out[1].precision_6 - 1.0) <= 1e-9
    assert abs(out[1].recall_6 - round(1 / 3, 6)) <= 1e-9
    assert out[5].hits == 2
    assert abs(out[5].precision_6 - 0.4) <= 1e-9
    assert out[10].hits == 3
    assert abs(out[10].recall_6 - 1.0) <= 1e-9


def test_kendall_distance_reversed_ranking(spark, tmp_path):
    """Value ranking exactly reverses the score ranking -> every pair
    discordant, distance 1, tau -1."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        q_kendall_rank_distance,
    )

    orders = [(i, float(i)) for i in range(1, 7)]  # value ASC = score DESC
    _write_rank_world(spark, tmp_path, _LINES, orders=orders)
    r = q_kendall_rank_distance(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 15
    assert r.discordant == 15
    assert abs(r.kendall_dist_6 - 1.0) <= 1e-9
    assert abs(r.kendall_tau_6 - (-1.0)) <= 1e-9


def test_kendall_distance_identical_ranking(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        q_kendall_rank_distance,
    )

    orders = [(i, float(7 - i)) for i in range(1, 7)]  # value DESC = score DESC
    _write_rank_world(spark, tmp_path, _LINES, orders=orders)
    r = q_kendall_rank_distance(spark, str(tmp_path)).collect()[0]
    assert (r.discordant, r.n_pairs) == (0, 15)
    assert abs(r.kendall_tau_6 - 1.0) <= 1e-9


def test_rbo_identical_lists_is_weight_sum(spark, tmp_path):
    """Identical rankings: overlap_d = d at every depth, so truncated
    RBO = sum of the 6-dp weights."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        _RBO_W,
        q_rbo_truncated_10,
    )

    orders = [(i, float(7 - i)) for i in range(1, 7)]
    _write_rank_world(spark, tmp_path, _LINES, orders=orders)
    r = q_rbo_truncated_10(spark, str(tmp_path)).collect()[0]
    assert r.overlap_at_10 == 6
    expect = sum(round(w * min(d, 6) / d, 9) for d, w in _RBO_W)
    assert abs(r.rbo_truncated_6 - round(expect, 6)) <= 1e-9


def test_rbo_disjoint_prefix(spark, tmp_path):
    """Value ranking reversed: top-1 lists disagree, overlap grows
    from the middle out; closed form from explicit rank pairs."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        _RBO_W,
        q_rbo_truncated_10,
    )

    orders = [(i, float(i)) for i in range(1, 7)]  # reversed
    _write_rank_world(spark, tmp_path, _LINES, orders=orders)
    r = q_rbo_truncated_10(spark, str(tmp_path)).collect()[0]
    # ra = i, rb = 7 - i for item i; overlap_d = |{i: i<=d and 7-i<=d}|
    def ov(d):
        return sum(1 for i in range(1, 7) if i <= d and 7 - i <= d)

    assert r.overlap_at_10 == 6
    expect = sum(round(w * ov(d) / d, 9) for d, w in _RBO_W)
    assert abs(r.rbo_truncated_6 - round(expect, 6)) <= 1e-9
