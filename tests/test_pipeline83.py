"""Unit tests for batch-83: exact-integer spatial analytics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_grid_density_partitions_points(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline83 import (
        q_geo_grid_density,
    )

    rows = q_geo_grid_density(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n for r in rows) == n_cust
    assert all(0 <= r.gx <= 9 and 0 <= r.gy <= 9 for r in rows)


def test_nearest_hub_total_assignment(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline83 import (
        q_geo_nearest_hub,
    )

    rows = q_geo_nearest_hub(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n_assigned for r in rows) == n_cust
    for r in rows:
        assert 0 <= r.closest_d2 <= r.farthest_d2


def test_bbox_membership_verified(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline83 import (
        _pts,
        q_geo_bbox_join,
    )

    rows = {r.box: r for r in q_geo_bbox_join(spark, SF).collect()}
    pts = {(p.id): (p.x, p.y) for p in _pts(spark, SF).collect()}
    # recompute box 0 membership by hand: x0=0, y0=50000
    inside0 = [
        i for i, (x, y) in pts.items() if 0 <= x < 200000 and 50000 <= y < 250000
    ]
    if inside0:
        assert rows[0].n_inside == len(inside0)
        assert rows[0].min_id == min(inside0)


def test_dbscan_counts_cover_dense_cells(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline83 import (
        q_geo_grid_dbscan,
    )

    rows = q_geo_grid_dbscan(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_cells >= 1
        assert r.n_points >= 3 * r.n_cells  # every member cell is dense


def test_radius_pairs_symmetric_free_and_verified(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline83 import (
        _pts,
        q_geo_pairs_within_radius,
    )

    rows = q_geo_pairs_within_radius(spark, SF).collect()
    assert rows
    pts = {p.id: (p.x, p.y) for p in _pts(spark, SF).collect()}
    for r in rows:
        assert r.a < r.b
        (ax, ay), (bx, by) = pts[r.a], pts[r.b]
        assert r.d2 == (ax - bx) ** 2 + (ay - by) ** 2
        assert r.d2 <= 2_500_000_000
