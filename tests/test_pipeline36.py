"""Unit tests for batch-36: zone maps, watermark lag profile, join
strategy advisor."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_zone_maps_date_layout_prunes_hash_does_not(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline36 import (
        q_zone_map_pruning_report,
    )

    rows = q_zone_map_pruning_report(spark, SF).collect()
    assert rows
    date_rows = [r for r in rows if r.layout == "date"]
    hash_rows = [r for r in rows if r.layout == "hash"]
    assert date_rows and hash_rows
    # same total row mass in both layouts
    assert sum(r.n_rows for r in date_rows) == sum(r.n_rows for r in hash_rows)
    # the date layout prunes most of its files; the hash layout none
    # (every hash file spans the full date range)
    assert sum(r.rows_skipped for r in date_rows) > 0
    assert all(not r.prunable for r in hash_rows)
    pruned_frac = sum(r.rows_skipped for r in date_rows) / sum(
        r.n_rows for r in date_rows
    )
    assert pruned_frac > 0.5
    for r in rows:
        assert (r.rows_skipped == r.n_rows) == r.prunable or r.rows_skipped == 0


def test_watermark_profile_jitter_accounting(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline36 import (
        q_watermark_lag_profile,
    )

    rows = q_watermark_lag_profile(spark, SF).collect()
    assert rows
    n_events = sum(r.n_events for r in rows)
    n_late = sum(r.n_late for r in rows)
    assert n_events == spark.read.parquet(f"{SF}/events.parquet").count()
    # ~1 in 10 events is jittered late; a jittered event is late unless
    # it happened to still be ahead of the watermark
    assert 0 < n_late <= n_events // 10 + 1
    for r in rows:
        assert r.dropped_at_30min <= r.dropped_at_10min <= r.n_late
        assert r.max_lateness_us >= 0


def test_join_advisor_thresholds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline36 import (
        _BROADCAST_ROWS,
        _SKEW_PPM,
        q_join_strategy_advisor,
    )

    rows = {r.pair: r for r in q_join_strategy_advisor(spark, SF).collect()}
    assert len(rows) == 4
    for r in rows.values():
        if r.dim_rows <= _BROADCAST_ROWS:
            assert r.strategy == "broadcast"
        elif r.hot_key_ppm > _SKEW_PPM:
            assert r.strategy == "salted_skew"
        else:
            assert r.strategy == "shuffle_hash"
        assert r.n_keys <= r.fact_rows
    # nation is 25 rows -> always broadcast
    assert rows["customer->nation"].strategy == "broadcast"
