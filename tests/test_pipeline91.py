"""Unit tests for batch-91: mix & concentration analytics."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_mix_shares_sum_per_month(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline91 import (
        q_category_mix_trend,
    )

    rows = q_category_mix_trend(spark, SF).collect()
    per_month = {}
    for r in rows:
        per_month.setdefault(r.month, []).append(r.share_ppm)
    for month, shares in per_month.items():
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000


def test_repeat_rate_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline91 import (
        q_first_value_repeat_rate,
    )

    rows = q_first_value_repeat_rate(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 0 <= r.n_repeated <= r.n_customers
        assert r.repeat_ppm == r.n_repeated * 1_000_000 // r.n_customers


def test_pareto_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline91 import (
        q_pareto_share_report,
    )

    rows = sorted(q_pareto_share_report(spark, SF).collect(), key=lambda r: r.pct)
    assert [r.pct for r in rows] == [1, 5, 10, 20, 50]
    shares = [r.share_ppm for r in rows]
    assert shares == sorted(shares)  # more customers -> more share
    # concentration: the top half holds MORE than half the revenue
    assert shares[-1] >= 500_000


def test_vocab_growth_monotone(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline91 import (
        q_vocab_growth_curve,
    )

    rows = sorted(q_vocab_growth_curve(spark, SF).collect(), key=lambda r: r.decile)
    sizes = [r.vocab_size for r in rows]
    assert sizes == sorted(sizes)
    full_vocab = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert sizes[-1] == full_vocab  # decile 10 = the whole corpus


def test_volume_anomalies_rare(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline91 import (
        q_daily_volume_anomalies,
    )

    rows = q_daily_volume_anomalies(spark, SF).collect()
    assert rows
    n_flagged = sum(r.volume_anomaly for r in rows)
    assert n_flagged <= len(rows) // 2  # 2-sigma flags are the minority
