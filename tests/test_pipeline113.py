"""Batch 113 invariants (the oracle hash-match is the primary gate;
these pin the semantic claims the oracles can't state directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.q_pipeline113 import (
    q_neardup_bucket_skew_report,
    q_neardup_index_merge,
)
from prosnet_prefect_pipelines_spark.plans.q_dedup import corpus


def test_index_merge_histogram_accounts_for_every_membership(spark, sf_dir):
    """sum(bucket_size * n_buckets) over the merged histogram == 4 bands
    x |corpus| — every document lands in exactly one bucket per band,
    merge loses and invents nothing."""
    hist = q_neardup_index_merge(spark, sf_dir)
    total = hist.agg(
        F.sum(F.col("bucket_size") * F.col("n_buckets")).alias("m")
    ).collect()[0].m
    n_docs = corpus(spark, sf_dir).count()
    assert total == 4 * n_docs
    assert hist.select("band").distinct().count() == 4


def test_skew_report_order_statistics_sane(spark, sf_dir):
    """Per band: p50 <= p90 <= max, singletons <= buckets, and the
    flood mass (members_over_cap) is zero iff no bucket exceeds the cap."""
    rows = q_neardup_bucket_skew_report(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert 1 <= r.p50_bucket <= r.p90_bucket <= r.max_bucket
        assert 0 <= r.n_singletons <= r.n_buckets
        assert (r.n_over_cap == 0) == (r.members_over_cap == 0)
        if r.n_over_cap:
            assert r.members_over_cap > 32 * r.n_over_cap - 32
