"""Unit tests for batch-21: item cosine bounds, phrase adjacency,
bootstrap weight distribution."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_item_cosine_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline21 import q_item_cosine

    out = q_item_cosine(spark, "/root/testdata/sf0.001").collect()
    for r in out:
        assert 0 < r.cosine <= 1.0 and r.i1 < r.i2


def test_phrase_search_adjacency_only(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b a c"), (3, "x a b y a b")], "doc_id long, text string"
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("p0", "tok")
    ).select("doc_id", "tok", (F.col("p0") + 1).alias("pos"))
    w1 = toks.filter("tok = 'a'").select("doc_id", "pos")
    w2 = toks.filter("tok = 'b'").select("doc_id", (F.col("pos") - 1).alias("pos"))
    got = {r.doc_id: r.n for r in
           w1.join(w2, ["doc_id", "pos"]).groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {1: 1, 3: 2}  # doc 2 has 'b a', not 'a b'


def test_bootstrap_weights_mean_near_one(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline21 import (
        q_bootstrap_ci_poisson,
    )

    out = q_bootstrap_ci_poisson(spark, "/root/testdata/sf0.01").collect()
    assert len(out) == 16
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    n = ev.filter("event_type = 'purchase'").count()
    # Poisson(1) weights: each replicate resamples ~n rows (+-5 sigma)
    for r in out:
        assert abs(r.n_resampled - n) < 5 * (n ** 0.5)
    # replicate means spread around the true mean
    means = [r.mean_scaled for r in out]
    assert max(means) > min(means) > 0
