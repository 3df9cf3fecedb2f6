"""Unit tests for batch-65: nearest-event join, k-truss support, gap
stats, apriori triples, RFM."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    ).write.parquet(f"{d}/events.parquet")


def test_nearest_event_picks_closest_and_tie_backward(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline65 import (
        q_nearest_event_join,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark,
            d,
            [
                # clicks at t=100s and t=300s; purchase at t=220s ->
                # forward click (80s) beats backward (120s)
                (1, "2024-01-01 00:01:40", 1, "click", 0.0, ""),
                (2, "2024-01-01 00:05:00", 1, "click", 0.0, ""),
                (3, "2024-01-01 00:03:40", 1, "purchase", 9.0, ""),
                # purchase equidistant (60s each side) -> backward wins
                (4, "2024-01-01 01:00:00", 2, "click", 0.0, ""),
                (5, "2024-01-01 01:02:00", 2, "click", 0.0, ""),
                (6, "2024-01-01 01:01:00", 2, "purchase", 9.0, ""),
                # purchase with no clicks at all -> null match
                (7, "2024-01-01 02:00:00", 3, "purchase", 9.0, ""),
            ],
        )
        out = {r.event_id: r for r in q_nearest_event_join(spark, d).collect()}
    assert out[3].click_id == 2 and out[3].abs_dt_us == 80_000_000
    assert out[6].click_id == 4 and out[6].abs_dt_us == 60_000_000
    assert out[7].click_id is None and out[7].abs_dt_us is None


def test_truss_support_triangle_graph(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline65 import (
        q_edge_triangle_support,
    )

    rows = q_edge_triangle_support(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a < r.b and r.support >= 1
        assert r.in_4truss == (1 if r.support >= 2 else 0)
    # cross-check total: sum of per-edge supports = 3 * triangle count
    from prosnet_prefect_pipelines_spark.plans.q_pipeline2 import (
        q_triangle_count,
    )

    triangles = q_triangle_count(spark, SF).collect()[0].triangles
    assert sum(r.support for r in rows) == 3 * triangles


def test_gap_stats_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline65 import (
        q_gap_stats_per_user,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 00:00:00", 1, "view", 0.0, ""),
                (2, "2024-01-01 00:10:00", 1, "view", 0.0, ""),
                (3, "2024-01-01 01:10:00", 1, "view", 0.0, ""),  # 1h break
            ],
        )
        (r,) = q_gap_stats_per_user(spark, d).collect()
    assert r.n_events == 3 and r.n_gaps == 2
    assert r.max_gap_us == 3600 * 1_000_000
    assert r.mean_gap_us == (600 + 3600) * 1_000_000 // 2
    assert r.n_breaks_30m == 1


def test_apriori_triples_subset_property(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline63 import (
        q_assoc_rules_lift,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline65 import (
        q_apriori_triples,
    )

    pairs = {
        (r.a, r.b) for r in q_assoc_rules_lift(spark, SF).collect()
    }  # frequent pairs at the same min-support 5
    triples = q_apriori_triples(spark, SF).collect()
    assert triples
    for t in triples:
        assert t.a < t.b < t.c and t.n_abc >= 5
        # apriori: every 2-subset of a frequent triple is frequent
        assert (t.a, t.b) in pairs and (t.a, t.c) in pairs and (t.b, t.c) in pairs


def test_rfm_tertile_shapes(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline65 import (
        q_rfm_segments,
    )

    rows = q_rfm_segments(spark, SF).collect()
    assert rows
    n = len(rows)
    for col in ("r_t", "f_t", "m_t"):
        vals = [getattr(r, col) for r in rows]
        assert set(vals) <= {1, 2, 3}
        # ntile balance: bucket sizes differ by at most 1
        sizes = [vals.count(t) for t in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1 and sum(sizes) == n
    # at least one user has a perfect recency (the corpus max holder)
    assert min(r.recency_us for r in rows) == 0
