"""Unit tests for batch-18: variant extraction, array stats folds,
max_by determinism, BOM path products."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_get_typed_and_missing(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"other": 1}'), (3, "not json")],
        "id long, props string",
    )
    v = F.parse_json("props") if not hasattr(F, "try_parse_json") else F.try_parse_json("props")
    out = {r.id: r.k for r in
           df.select("id", F.try_variant_get(v, "$.k", "bigint").alias("k")).collect()}
    assert out[1] == 7 and out[2] is None and out[3] is None


def test_array_stats_fold_exact(spark):
    df = spark.createDataFrame([(1, [0.5, -1.25, 2.0])], "id long, v array<double>")
    s = F.transform("v", lambda x: F.round(x * 1000000, 0).cast("long"))
    zero = F.lit(0).cast("long")
    r = df.select(
        F.aggregate(s, zero, lambda a, x: a + x).alias("sum"),
        F.array_min(s).alias("mn"),
        F.array_max(s).alias("mx"),
        F.aggregate(s, zero, lambda a, x: a + x * x).alias("sq"),
    ).first()
    assert r.sum == 1_250_000 and r.mn == -1_250_000 and r.mx == 2_000_000
    assert r.sq == 250_000_000_000 + 1_562_500_000_000 + 4_000_000_000_000


def test_max_by_composite_ordinal_total(spark):
    # two events same microsecond: event_id breaks the tie
    df = spark.createDataFrame(
        [(7, 1, "a", 100), (7, 2, "b", 100), (7, 3, "c", 50)],
        "user long, eid long, t string, us long",
    )
    ordc = (F.col("us") * 1000000 + F.col("eid")).alias("ord")
    r = df.select("user", "eid", "t", ordc).groupBy("user").agg(
        F.max_by("t", "ord").alias("last")
    ).first()
    assert r.last == "b"


def test_bom_path_product(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline18 import q_bom_rollup

    out = {r.part: (r.depth, r.root_qty)
           for r in q_bom_rollup(spark, "/root/testdata/sf0.001").collect()}
    # hand-check part 21: 21 -> 5 -> 1 -> 0; qty = (21%3+1)*(5%3+1)*(1%3+1)
    assert out[21] == (3, (21 % 3 + 1) * (5 % 3 + 1) * (1 % 3 + 1))
    # direct child of root
    assert out[2] == (1, 2 % 3 + 1)
