"""Unit tests for batch-90: attribution & data preparation."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_attribution_credits_conserve(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline90 import (
        q_attribution_linear_remainder,
    )
    from prosnet_prefect_pipelines_spark.model import read_events

    rows = q_attribution_linear_remainder(spark, SF).collect()
    assert rows
    # total credit = 1e6 * number of conversions that HAVE >=1 touch
    ev = read_events(spark, SF).filter(F.col("user_id").isNotNull())
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("cid"), F.col("ts_us").alias("cts")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("ts_us").alias("tts")
    )
    n_attributed = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tts") < F.col("cts"))
            & (F.col("cts") - F.col("tts") <= 86_400_000_000)
        )
        .select("cid")
        .distinct()
        .count()
    )
    assert sum(r.credit_micro_total for r in rows) == 1_000_000 * n_attributed


def test_bow_dedup_groups(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline90 import (
        q_dedup_bow_signature,
    )

    rows = q_dedup_bow_signature(spark, SF).collect()
    for r in rows:
        assert r.n_docs >= 2 and r.keeper >= 0


def test_price_endings_shares(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline90 import (
        q_price_endings_audit,
    )

    rows = q_price_endings_audit(spark, SF).collect()
    assert rows
    assert all(0 <= r.ending <= 99 and r.n >= 50 for r in rows)
    assert sum(r.share_ppm for r in rows) <= 1_000_000


def test_keyset_equals_offset(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline90 import (
        q_keyset_pagination_equivalence,
    )

    out = {r.method: r for r in q_keyset_pagination_equivalence(spark, SF).collect()}
    a, b = out["offset"], out["keyset"]
    assert (a.n, a.first_key, a.last_key, a.cents) == (
        b.n, b.first_key, b.last_key, b.cents,
    )
    assert a.n == 20


def test_minmax_endpoints(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline90 import (
        q_normalize_minmax_groups,
    )

    rows = q_normalize_minmax_groups(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_at_min >= 1 and r.n_at_max >= 1  # endpoints realized
        assert 0 <= r.mean_norm_micro <= 1_000_000
