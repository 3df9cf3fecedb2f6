"""Unit tests for batch-111: privacy risk metrics round 2.

World: three (nation, year) QI groups — a 90%-homogeneous group of
10, a balanced group of 10, and a sample-unique singleton — pinning
l-diversity (distinct + entropy), t-closeness TVDs, the k-level
histogram and the exact integer homogeneity test max_c*10 >= ng*9.
"""

from __future__ import annotations

import datetime as dt
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _world(spark, path):
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    rows, ok = [], 0
    # group A: nation 0, 1996 — 9x URGENT + 1x LOW (90% homogeneous)
    for sv in ["1-URGENT"] * 9 + ["5-LOW"]:
        ok += 1
        rows.append((ok, 1, "O", 1.0, dt.datetime(1996, 3, 1), sv))
    # group B: nation 1, 1996 — 5x URGENT + 5x LOW (balanced)
    for sv in ["1-URGENT"] * 5 + ["5-LOW"] * 5:
        ok += 1
        rows.append((ok, 2, "O", 1.0, dt.datetime(1996, 6, 1), sv))
    # group C: nation 1, 1997 — singleton MEDIUM
    ok += 1
    rows.append((ok, 2, "O", 1.0, dt.datetime(1997, 6, 1), "3-MEDIUM"))
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def test_l_diversity_distinct_and_entropy(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline111 import (
        q_l_diversity_report,
    )

    _world(spark, tmp_path)
    r = q_l_diversity_report(spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.min_l) == (3, 1)
    assert abs(r.share_l_ge_2_6 - round(2 / 3, 6)) <= 1e-9
    assert abs(r.share_l_ge_3_6 - 0.0) <= 1e-9
    # singleton group: entropy 0 (p=1 term)
    assert abs(r.min_entropy_l_6 - 0.0) <= 1e-9


def test_t_closeness_tvds(spark, tmp_path):
    """Global dist (21): URGENT 14, LOW 6, MEDIUM 1. Group TVDs:
    A 49/210, B 45/210, C 20/21 -> all breach 0.2."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline111 import (
        q_t_closeness_report,
    )

    _world(spark, tmp_path)
    r = q_t_closeness_report(spark, str(tmp_path)).collect()[0]
    assert r.n_groups == 3
    t_a = (abs(9 * 21 - 14 * 10) + abs(1 * 21 - 6 * 10) + abs(0 - 1 * 10)) / (2 * 10 * 21)
    t_b = (abs(5 * 21 - 14 * 10) + abs(5 * 21 - 6 * 10) + abs(0 - 1 * 10)) / (2 * 10 * 21)
    t_c = (abs(0 - 14) + abs(0 - 6) + abs(21 - 1)) / (2 * 1 * 21)
    assert abs(r.max_t_6 - round(t_c, 6)) <= 1e-9
    mean = (round(t_a, 6) + round(t_b, 6) + round(t_c, 6)) / 3
    assert abs(r.mean_t_6 - round(mean, 6)) <= 1e-9
    assert r.groups_over_02 == 3


def test_uniqueness_histogram(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline111 import (
        q_uniqueness_risk_report,
    )

    _world(spark, tmp_path)
    r = q_uniqueness_risk_report(spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.unique_groups) == (3, 1)
    assert (r.k2_4_groups, r.k5_9_groups, r.k10_groups) == (0, 0, 2)
    assert abs(r.unique_group_share_6 - round(1 / 3, 6)) <= 1e-9
    assert abs(r.unique_record_share_6 - round(1 / 21, 6)) <= 1e-9


def test_homogeneity_exact_integer_threshold(spark, tmp_path):
    """Group A: 9*10 >= 10*9 (exactly 90%) and the singleton both
    flag; the balanced group does not."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline111 import (
        q_homogeneity_attack_screen,
    )

    _world(spark, tmp_path)
    r = q_homogeneity_attack_screen(spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.homogeneous_groups) == (3, 2)
    assert abs(r.exposed_record_share_6 - round(11 / 21, 6)) <= 1e-9
    assert abs(r.avg_top_value_share_6 - round(15 / 21, 6)) <= 1e-9
