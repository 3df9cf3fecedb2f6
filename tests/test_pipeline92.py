"""Unit tests for batch-92: closing breadth."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_clustering_coefficient_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline92 import (
        q_node_clustering_coefficient,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline2 import (
        q_triangle_count,
    )

    rows = q_node_clustering_coefficient(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.clustering_ppm <= 1_000_000
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2
    # sum of per-node triangle counts = 3 * global triangles
    triangles = q_triangle_count(spark, SF).collect()[0].triangles
    assert sum(r.n_triangles for r in rows) == 3 * triangles


def test_rank_uniform_centered(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline92 import (
        q_rank_uniform_transform,
    )

    rows = q_rank_uniform_transform(spark, SF).collect()
    for r in rows:
        assert 0 <= r.min_u_micro <= r.max_u_micro < 1_000_000
        # tie-corrected uniform positions average exactly 1/2 (trunc slack)
        assert 499_000 <= r.mean_u_micro <= 500_000


def test_covisitation_symmetric_free(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline92 import (
        q_covisitation_pairs,
    )

    rows = q_covisitation_pairs(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.item_a < r.item_b and r.n_sessions >= 1
        assert (r.item_a, r.item_b) not in seen
        seen.add((r.item_a, r.item_b))


def test_enum_drift_fires_on_plant(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline92 import (
        q_enum_drift_report,
    )

    rows = q_enum_drift_report(spark, SF).collect()
    assert {r.new_value for r in rows} == {"error_v2"}
    assert all(r.n > 0 for r in rows)


def test_topk_stability_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline92 import (
        q_topk_stability_report,
    )

    (r,) = q_topk_stability_report(spark, SF).collect()
    assert r.n_common <= min(r.n_top1, r.n_top2)
    union = r.n_top1 + r.n_top2 - r.n_common
    assert r.jaccard_ppm == r.n_common * 1_000_000 // union
