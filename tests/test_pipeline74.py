"""Unit tests for batch-74: feature-engineering tier."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_loo_excludes_self(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline74 import (
        q_loo_target_encoding,
    )

    out = q_loo_target_encoding(spark, SF)
    # recompute per-category sums and verify the LOO identity per row
    g = out.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    j = out.join(g, "cat").filter(F.col("n") > 1)
    bad = j.filter(
        F.col("loo_enc_micro")
        != F.expr("CAST((s - y) AS DECIMAL(38,0)) * 1000000 div (n - 1)")
    ).count()
    assert bad == 0


def test_collapse_preserves_total(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline74 import (
        q_category_collapse_encoding,
    )

    rows = q_category_collapse_encoding(spark, SF).collect()
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    assert sum(r.n for r in rows) == n_parts
    for r in rows:
        if r.cat_out != "__other__":
            assert r.n >= 20


def test_feature_cross_buckets_bounded(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline74 import (
        q_hashed_feature_cross,
    )

    rows = q_hashed_feature_cross(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n for r in rows) == n_orders
    assert all(0 <= r.bucket < 64 for r in rows)
    assert all(r.n_distinct_crosses >= 1 for r in rows)


def test_lag_features_chain(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline74 import (
        q_lag_feature_table,
    )

    rows = q_lag_feature_table(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        # event_id order within a user tracks ts order in this corpus;
        # reconstruct the sequence via lag1 linkage instead of ts
        cents_with_lag1 = [(r.cents, r.lag1_cents, r.lag2_cents, r.rolling3_mean_cents) for r in rs]
        firsts = [t for t in cents_with_lag1 if t[1] is None]
        assert len(firsts) == 1  # exactly one sequence head per user
        for c, l1, l2, r3 in cents_with_lag1:
            if r3 is not None:
                assert l1 is not None and l2 is not None
                assert r3 == (c + l1 + l2) // 3


def test_onehot_triplets(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline74 import (
        q_onehot_sparse_encode,
    )

    rows = q_onehot_sparse_encode(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert len(rows) == n_orders  # exactly one hot feature per row
    idxs = {r.feature_idx for r in rows}
    assert idxs == set(range(len(idxs)))  # dense 0..k-1 vocabulary
    assert all(r.value == 1 for r in rows)
