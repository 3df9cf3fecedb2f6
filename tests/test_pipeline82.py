"""Unit tests for batch-82: incremental-processing depth."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_incremental_merge_exact_everywhere(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline82 import (
        q_incremental_agg_equivalence,
    )

    rows = q_incremental_agg_equivalence(spark, SF).collect()
    assert rows
    assert all(r.states_merge_exactly == 1 for r in rows)
    assert all(r.n_full == r.n_merged and r.cents_full == r.cents_merged for r in rows)


def test_tombstone_partition(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline82 import (
        q_cdc_tombstone_compaction,
    )

    (r,) = q_cdc_tombstone_compaction(spark, SF).collect()
    assert r.n_keys == r.n_live + r.n_tombstones
    assert r.n_live > 0 and r.n_tombstones > 0
    assert r.live_cents > 0


def test_identity_stitching_covers_users(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline82 import (
        q_identity_stitching,
    )
    from pyspark.sql import functions as F

    rows = q_identity_stitching(spark, SF).collect()
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    # shared device/email hubs collapse users into FEW identities
    assert len(rows) < n_users or n_users <= 1
    for r in rows:
        assert r.n_ids >= r.n_users  # hubs are extra ids in the cluster


def test_time_travel_versions(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline82 import (
        q_manifest_time_travel_diff,
    )

    (r,) = q_manifest_time_travel_diff(spark, SF).collect()
    assert r.v1_rows == 15 and r.v2_rows == 25
    assert r.rows_added == 10
    assert r.v1_key_sum == sum(range(15))
    assert r.v2_key_sum == sum(range(25))


def test_late_arrival_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline82 import (
        q_late_arrival_accounting,
    )

    (r,) = q_late_arrival_accounting(spark, SF).collect()
    assert 0 <= r.n_late <= r.n_arrivals
    assert r.late_ppm == r.n_late * 1_000_000 // r.n_arrivals
    if r.n_late:
        assert r.max_lateness_us > 0
