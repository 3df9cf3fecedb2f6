"""Unit tests for batch-87: media plumbing + web metrics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_phash_groups_are_collisions(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline87 import (
        q_media_phash_dedup,
    )

    rows = q_media_phash_dedup(spark, SF).collect()
    for r in rows:
        assert r.n_docs >= 2
        assert 0 <= r.phash < 2**16


def test_chunk_manifest_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline87 import (
        q_media_chunk_manifest,
    )
    from pyspark.sql import functions as F

    (r,) = q_media_chunk_manifest(spark, SF).collect()
    assert r.n_unique <= r.n_chunks
    assert r.dedup_ppm == (r.n_chunks - r.n_unique) * 1_000_000 // r.n_chunks
    total_chars = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .agg(F.sum(F.length("text")))
        .first()[0]
    )
    # chunk bytes cover the payloads up to the 64-chunk cap per doc
    assert r.total_bytes <= total_chars


def test_metadata_profile_formats(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline87 import (
        q_media_metadata_profile,
    )

    rows = {r.format: r for r in q_media_metadata_profile(spark, SF).collect()}
    assert set(rows) == {"jpeg", "png", "webp"}
    for r in rows.values():
        assert r.min_width >= 320 and r.max_height < 240 + 900
        assert r.micro_bytes_per_pixel > 0


def test_bounce_rate_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline87 import (
        q_bounce_rate_report,
    )

    (r,) = q_bounce_rate_report(spark, SF).collect()
    assert 0 <= r.n_bounces <= r.n_sessions
    assert r.bounce_ppm == r.n_bounces * 1_000_000 // r.n_sessions
    assert r.mean_events_micro >= 1_000_000  # sessions have >= 1 event


def test_order_sizes_cover_orders(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline87 import (
        q_order_size_distribution,
    )
    from pyspark.sql import functions as F

    rows = q_order_size_distribution(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_orders = li.select("l_orderkey").distinct().count()
    n_lines = li.count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_lines * r.n_orders for r in rows) == n_lines
