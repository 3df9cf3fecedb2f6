"""Unit tests for batch-16: chi2 cells, itemset supports, grid geo-join
vs brute force, seasonal residual scaling."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_chi2_expected_sums_match_observed(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline16 import q_ab_test_chi2

    out = q_ab_test_chi2(spark, "/root/testdata/sf0.001").collect()
    total_o = sum(r.o for r in out)
    total_e = sum(r.expected for r in out)
    assert abs(total_o - total_e) < 1e-3  # expected counts preserve the total
    assert all(r.chi2_term >= 0 for r in out)


def test_basket_triples_within_basket_only(spark):
    items = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 4), (3, 1), (3, 2), (3, 3)],
        "l_orderkey long, item long",
    )
    x, y, z = items.alias("x"), items.alias("y"), items.alias("z")
    triples = (
        x.join(y, on="l_orderkey").filter(F.col("x.item") < F.col("y.item"))
        .join(z, on="l_orderkey").filter(F.col("y.item") < F.col("z.item"))
        .groupBy(F.col("x.item").alias("i1"), F.col("y.item").alias("i2"),
                 F.col("z.item").alias("i3"))
        .agg(F.count(F.lit(1)).alias("s"))
    )
    got = {(r.i1, r.i2, r.i3): r.s for r in triples.collect()}
    assert got == {(1, 2, 3): 2, (1, 2, 4): 1}


def test_geo_grid_join_matches_bruteforce(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline16 import q_geo_grid_join

    sf = "/root/testdata/sf0.001"
    got = {(r.cid, r.sid) for r in q_geo_grid_join(spark, sf).collect()}

    sup = spark.read.parquet(f"{sf}/supplier.parquet").collect()
    cust = spark.read.parquet(f"{sf}/customer.parquet").collect()
    expect = set()
    for c in cust:
        if c.c_custkey % 5 != 0:
            continue
        cx, cy = (c.c_custkey % 1000) / 100, ((c.c_custkey * 3) % 1000) / 100
        for s in sup:
            sx, sy = (s.s_suppkey % 1000) / 100, ((s.s_suppkey * 7) % 1000) / 100
            if (cx - sx) ** 2 + (cy - sy) ** 2 <= 0.25:
                expect.add((c.c_custkey, s.s_suppkey))
    assert got == expect and expect


def test_seasonal_residuals_sum_to_zero_per_weekday(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline16 import q_seasonal_residuals

    out = q_seasonal_residuals(spark, "/root/testdata/sf0.001").collect()
    from collections import defaultdict

    sums = defaultdict(int)
    for r in out:
        sums[(r.event_type, r.weekday)] += r.residual_scaled
    assert all(v == 0 for v in sums.values())  # D*(n - mean) sums to 0 per group
