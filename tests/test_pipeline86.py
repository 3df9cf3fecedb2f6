"""Unit tests for batch-86: graph statistics & recommendation."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_assortativity_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline86 import (
        q_degree_assortativity_exact,
    )

    (r,) = q_degree_assortativity_exact(spark, SF).collect()
    assert r.r_sign in (-1, 0, 1)
    assert 0 <= r.r2_ppm <= 1_000_000
    assert r.n_endpoints % 2 == 0  # both orientations


def test_reciprocity_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline86 import (
        q_graph_reciprocity_report,
    )

    (r,) = q_graph_reciprocity_report(spark, SF).collect()
    assert 0 <= r.n_reciprocated <= r.n_edges
    assert r.reciprocity_ppm == r.n_reciprocated * 1_000_000 // r.n_edges
    assert r.n_edges <= r.n_nodes * (r.n_nodes - 1)


def test_robustness_conservation(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline86 import (
        q_network_robustness_report,
    )

    (r,) = q_network_robustness_report(spark, SF).collect()
    assert r.edges_before == r.edges_after + r.edges_lost
    # removing a degree-d hub removes exactly its d incident edges
    assert r.edges_lost == r.hub_degree


def test_tukey_quartiles_ordered(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline86 import (
        q_tukey_outlier_fences,
    )

    rows = q_tukey_outlier_fences(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.q1_cents <= r.q3_cents
        assert 0 <= r.n_outliers < r.n


def test_recommender_never_rerecommends(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline86 import (
        q_popularity_recommender,
    )

    reco = q_popularity_recommender(spark, SF)
    rows = reco.collect()
    assert rows
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r.cust, []).append(r)
    for cust, rs in per_cust.items():
        picks = sorted(x.pick for x in rs)
        assert picks == list(range(1, len(picks) + 1))
        assert len(rs) <= 3
        assert len({x.brand for x in rs}) == len(rs)
    # spot-check the exclusion: no recommended brand was already bought
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    bought = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(part, part["p_partkey"] == li["l_partkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    overlap = reco.join(bought, ["cust", "brand"], "left_semi").count()
    assert overlap == 0
