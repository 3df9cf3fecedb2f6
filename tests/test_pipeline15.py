"""Unit tests for batch-15 GNN data prep: neighbor sampling caps,
walk determinism, negative-sample validity, neighbor aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_neighbor_sampling_caps_fanout(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import q_neighbor_sampling

    out = q_neighbor_sampling(spark, "/root/testdata/sf0.001")
    per_src = out.groupBy("src").count().collect()
    assert all(r["count"] <= 5 for r in per_src)
    # deterministic on rerun
    a = {(r.src, r.dst) for r in out.collect()}
    b = {(r.src, r.dst)
         for r in q_neighbor_sampling(spark, "/root/testdata/sf0.001").collect()}
    assert a == b


def test_walks_follow_edges(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import (
        _edges,
        q_deterministic_walks,
    )

    e = {(r.src, r.dst) for r in _edges(spark, "/root/testdata/sf0.001").collect()}
    walks = q_deterministic_walks(spark, "/root/testdata/sf0.001").collect()
    assert walks
    for r in walks:
        assert (r.seed, r.n1) in e and (r.n1, r.n2) in e and (r.n2, r.n3) in e


def test_link_split_negatives_are_nonedges(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import (
        _edges,
        q_link_prediction_split,
    )

    sf = "/root/testdata/sf0.001"
    e = {(r.src, r.dst) for r in _edges(spark, sf).collect()}
    out = q_link_prediction_split(spark, sf).collect()
    pos = [(r.src, r.dst) for r in out if r.label == 1]
    neg = [(r.src, r.dst) for r in out if r.label == 0]
    assert set(pos) == e
    assert not (set(neg) & e) and all(s != d for s, d in neg)
    splits = {r.split for r in out}
    assert splits == {"train", "test"}


def test_neighbor_agg_mean(spark):
    e = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    f = spark.createDataFrame([(2, 10.0), (3, 20.0)], "node long, feat double")
    got = (
        e.join(f.withColumnRenamed("node", "dst"), on="dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("feat") / F.count(F.lit(1)), 6).alias("m"))
        .first()
    )
    assert got.n == 2 and got.m == 15.0
