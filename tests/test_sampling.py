"""Sampling / splitting / packing invariants (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import sampling as S


def test_hash_sample_deterministic_and_stable_under_repartition(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in S.hash_sample(df, "k", 0.3).collect())
    b = sorted(r.k for r in S.hash_sample(df.repartition(13), "k", 0.3).collect())
    assert a == b
    # roughly the requested rate (portable hash is uniform)
    assert 0.25 < len(a) / 2000 < 0.35


def test_hash_sample_nested_fractions(spark):
    # a 10% sample is a subset of the 30% sample drawn with the same salt:
    # membership is u < fraction on one shared u per key
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = {r.k for r in S.hash_sample(df, "k", 0.1).collect()}
    big = {r.k for r in S.hash_sample(df, "k", 0.3).collect()}
    assert small <= big


def test_split_is_pure_in_the_key(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    full = {r.k: r.split for r in S.train_val_test(df, "k").collect()}
    # growing the table never moves an existing key's split
    grown = {r.k: r.split for r in S.train_val_test(
        spark.range(0, 3000).withColumnRenamed("id", "k"), "k").collect()}
    assert all(grown[k] == v for k, v in full.items())
    assert {"train", "val", "test"} == set(full.values())


def test_stratified_fractions_respected(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "k long, g string"
    )
    out = S.stratified_sample(df, "k", "g", {"a": 1.0}, default=0.0).collect()
    assert all(r.g == "a" for r in out)
    assert len(out) == 1000


def test_pack_greedy_bins_respect_budget_up_to_one_doc(spark):
    df = spark.createDataFrame(
        [(i, i % 4, 10 + (i * 7) % 90) for i in range(400)],
        "doc long, shard int, n long",
    )
    packed = S.pack_greedy(df, "shard", "doc", "n", budget=100).collect()
    by_bin: dict = {}
    for r in packed:
        by_bin.setdefault((r.shard, r.bin), []).append(r)
    for (_, _), rows in by_bin.items():
        total = sum(r.n for r in rows)
        # a bin overflows only by its last (straddling) document
        assert total - max(r.n for r in rows) < 100
        # offsets are the running layout positions
        rows.sort(key=lambda r: r.doc)
        assert rows[0].bin_offset + rows[0].n >= 0
    # every doc is assigned exactly once
    assert len(packed) == 400
