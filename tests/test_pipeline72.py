"""Unit tests for batch-72: CUPED, lang-id confusion, schema evolution,
dynamic overwrite, strict funnel."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_cuped_two_variants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline72 import (
        q_cuped_adjustment,
    )

    rows = {r.variant: r for r in q_cuped_adjustment(spark, SF).collect()}
    assert set(rows) == {0, 1}
    thetas = {r.theta_micro for r in rows.values()}
    assert len(thetas) == 1  # pooled theta identical for both variants
    for r in rows.values():
        assert r.n_users > 0


def test_lang_id_confusion_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline72 import (
        q_lang_id_confusion,
    )

    rows = q_lang_id_confusion(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    # the planted marker suffixes make the classifier mostly right
    n_correct = sum(r.n for r in rows if r.correct == 1)
    assert n_correct * 2 > n_docs


def test_schema_evolution_null_fill(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline72 import (
        q_schema_evolution_roundtrip,
    )

    rows = q_schema_evolution_roundtrip(spark, SF).collect()
    assert sum(r.n for r in rows) == 25
    # batch-1 rows (keys < 13) surface as NULL extra
    assert sum(r.n_batch1 for r in rows) == 13
    assert sum(r.extra_sum for r in rows) == sum(range(13, 25))


def test_dynamic_overwrite_only_one_partition(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline72 import (
        q_partition_overwrite_dynamic,
    )

    out = {r.n_regionkey: r for r in q_partition_overwrite_dynamic(spark, SF).collect()}
    src = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("ks"))
        .collect()
    )
    for r in src:
        assert out[r.n_regionkey].n == r.n
        if r.n_regionkey == 2:
            assert out[2].key_sum == r.ks + 100 * r.n  # rewritten +100 each
        else:
            assert out[r.n_regionkey].key_sum == r.ks  # untouched


def test_strict_funnel_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline72 import (
        q_funnel_strict_windows,
    )

    out = {r.step: r.n_users for r in q_funnel_strict_windows(spark, SF).collect()}
    assert out["signup"] >= out["click_within_7d"] >= out["purchase_within_7d"]
    assert out["signup"] > 0
