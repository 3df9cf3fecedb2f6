"""Unit tests for batch-66: RAKE, exact Pearson, DAU Jaccard,
conversion latency, HHI."""

from __future__ import annotations

import tempfile

SF = "/root/testdata/sf0.001"


def test_rake_hand_computed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline66 import (
        q_rake_keywords,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "red apples and green apples", "en", "s", 27)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        rows = {r.phrase: r for r in q_rake_keywords(spark, d).collect()}
    # phrases: "red apples", "green apples"; freq(apples)=2 deg=4,
    # freq(red)=1 deg=2, freq(green)=1 deg=2
    # score(red apples) = 2e6 + 2e6 = 4e6; same for green apples
    assert rows["red apples"].score_micro == 4_000_000
    assert rows["green apples"].score_micro == 4_000_000
    assert rows["red apples"].n_words == 2


def test_pearson_perfect_correlation(spark):
    import pyspark.sql.functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline66 import (
        q_pearson_r2_exact,
    )

    rows = q_pearson_r2_exact(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.r_sign in (-1, 0, 1)
        assert 0 <= r.r2_ppm <= 1_000_000


def test_dau_jaccard_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline66 import (
        q_dau_overlap_jaccard,
    )

    rows = q_dau_overlap_jaccard(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_retained <= min(r.dau, r.dau_next)
        assert 0 <= r.jaccard_ppm <= 1_000_000
        union = r.dau + r.dau_next - r.n_retained
        assert r.jaccard_ppm == r.n_retained * 1_000_000 // union


def test_conversion_latency_buckets(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline66 import (
        q_conversion_latency_histogram,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 1, "signup", 0.0, ""),
                (2, "2024-01-01 00:00:30", 1, "purchase", 5.0, ""),  # 30s
                (3, "2024-01-01 00:00:00", 2, "signup", 0.0, ""),
                (4, "2024-01-03 00:00:00", 2, "purchase", 5.0, ""),  # 2d
                # purchase BEFORE signup must not count
                (5, "2024-01-01 00:00:00", 3, "purchase", 5.0, ""),
                (6, "2024-01-02 00:00:00", 3, "signup", 0.0, ""),
            ],
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(f"{d}/events.parquet")
        out = {r.bucket: r.n for r in q_conversion_latency_histogram(spark, d).collect()}
    assert out == {"0_under_1m": 1, "3_over_1d": 1}


def test_hhi_bounds_and_monopoly_scaling(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline66 import (
        q_market_concentration_hhi,
    )

    rows = q_market_concentration_hhi(spark, SF).collect()
    assert rows
    for r in rows:
        # HHI between 1e6/n (perfect split) and 1e6 (monopoly);
        # truncation can only lower it
        assert r.hhi_ppm <= 1_000_000
        assert r.hhi_ppm >= 1_000_000 // r.n_suppliers - r.n_suppliers
        assert r.top_share_ppm * r.top_share_ppm // 1_000_000 <= r.hhi_ppm
