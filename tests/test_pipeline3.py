"""Unit tests for batch-3 operators: CDC apply, Z-order, portable HLL,
Bloom semi-join, weighted SSSP."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import sketch as SK
from prosnet_prefect_pipelines_spark.operators.audit import cdc_apply
from prosnet_prefect_pipelines_spark.operators.graph import sssp_weighted
from prosnet_prefect_pipelines_spark.operators.layout import zorder_key, zorder_layout_stats


def test_cdc_apply_semantics(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", 1),
            (1, "a3", "U", 2),   # later seq wins
            (2, "b", "D", 1),    # delete
            (2, "b2", "U", 2),   # ... then re-insert: final state b2
            (3, "dead", "D", 9), # delete existing
            (4, "d", "U", 1),    # insert new key
            (5, "x", "D", 1),    # delete of a key that never existed
        ],
        "k long, v string, op string, seq long",
    )
    got = {r.k: r.v for r in cdc_apply(base, changes, ["k"], order_cols=["seq"]).collect()}
    assert got == {1: "a3", 2: "b2", 4: "d"}


def test_zorder_key_interleave(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=3 (011) -> even bits 0b010101 & x-part: bits 0,2; y=5 (101) -> odd bits 1,5
    # z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    #   =  1      2       4       0       0       32    = 39
    assert df.select(zorder_key(F.col("x"), F.col("y"), 3).alias("z")).collect()[0].z == 39


def test_zorder_locality(spark):
    # dense 64x64 grid: under Z-layout with 16 files each file must span
    # at most a 16x32 sub-rectangle (vs a row-major sort where y spans 64)
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    stats = zorder_layout_stats(pts, "x", "y", bits=6, files=16).collect()
    assert len(stats) == 16
    for r in stats:
        assert (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) <= 16 * 32


def test_hll_estimate_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id"))
    r = SK.hll_distinct(df, ["g"], "id").collect()[0]
    assert abs(r.hll_estimate - n) / n < 0.10  # 512 registers -> ~4.6% rse
    assert r.registers_set == SK.HLL_M  # far past the sparse range


def test_bloom_no_false_negatives_and_prunes(spark):
    fact = spark.range(50_000).select(F.col("id").alias("k"))
    dim = spark.range(0, 50_000, 100).select(F.col("id").alias("dk"))  # 500 keys
    exact = {r.k for r in fact.join(
        dim.select(F.col("dk").alias("k")), on="k", how="left_semi").collect()}
    got = {r.k for r in SK.bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert got == exact
    # the prefilter alone must pass every member and drop most non-members
    words = SK.bloom_build(dim, "dk")
    kept = SK.bloom_prune(fact, "k", words).count()
    assert kept >= 500
    assert kept < 5_000  # m/n=32 bits/key, k=4 -> fp rate ~2-3%


def test_sssp_prefers_cheap_long_path(spark):
    edges = spark.createDataFrame(
        [("s", "t", 10), ("s", "a", 1), ("a", "b", 1), ("b", "t", 1),
         ("t", "s", 1)],  # cycle back
        "src string, dst string, w long",
    )
    got = {r.node: r.dist for r in sssp_weighted(edges, ["s"]).collect()}
    assert got == {"s": 0, "a": 1, "b": 2, "t": 3}
