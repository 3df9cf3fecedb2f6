"""Unit tests for batch-19: Gini bounds, Benford expectations,
transition normalization, HLL intersection sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gini_bounds_and_extremes(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline19 import q_gini_concentration

    out = q_gini_concentration(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert 0 <= r.gini_ppm < 1_000_000

    # uniform mass -> gini 0
    df = spark.createDataFrame([("s", i, 10) for i in range(4)],
                               "source string, doc_id long, n_chars long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = df.select("source", F.col("n_chars").cast("long").alias("x"),
                       F.row_number().over(w).cast("long").alias("i"))
    g = ranked.groupBy("source").agg(F.expr(
        "CAST((2 * sum(i * x) - (count(1) + 1) * sum(x)) * 1000000"
        " div (count(1) * sum(x)) AS BIGINT)").alias("g")).first().g
    assert g == 0


def test_benford_expected_ppm_sums_to_million(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline19 import _BENFORD_PPM

    assert abs(sum(_BENFORD_PPM.values()) - 1_000_000) <= 5  # rounding slack
    assert _BENFORD_PPM[1] == 301029


def test_transition_rates_normalize(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline19 import q_transition_matrix

    out = q_transition_matrix(spark, "/root/testdata/sf0.001").collect()
    from collections import defaultdict

    by_from = defaultdict(int)
    for r in out:
        by_from[r.from_type] += r.rate_ppm
    # integer floor division loses at most (k-1) ppm per row
    for total in by_from.values():
        assert 1_000_000 - 30 <= total <= 1_000_000


def test_hll_intersection_sanity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline19 import q_hll_intersection

    r = q_hll_intersection(spark, "/root/testdata/sf0.01").first()
    assert r.est_union <= r.est_a + r.est_b
    assert r.est_intersection == r.est_a + r.est_b - r.est_union
    # clicks and views share most users at this sf — overlap must be large
    assert r.est_intersection > 0
