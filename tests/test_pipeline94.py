"""Unit tests for batch-94: closing engine-parity surfaces."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_json_roundtrip_lossless(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline94 import (
        q_json_struct_roundtrip,
    )

    rows = q_json_struct_roundtrip(spark, SF).collect()
    src = {
        r.n_nationkey: r for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    assert all(r.roundtrip_ok == 1 for r in rows)
    for r in rows:
        assert r.k_back == r.n_nationkey
        assert r.name_back == src[r.n_nationkey].n_name
        assert r.region_back == src[r.n_nationkey].n_regionkey


def test_weekday_index_centers(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline94 import (
        q_weekday_revenue_index,
    )

    rows = q_weekday_revenue_index(spark, SF).collect()
    assert {r.dow for r in rows} <= set(range(1, 8))
    # indexes average ~1e6 by construction (truncation slack)
    mean_idx = sum(r.index_ppm for r in rows) // len(rows)
    assert 990_000 <= mean_idx <= 1_010_000


def test_minby_matches_window_argmin(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.plans.q_pipeline94 import (
        q_minby_maxby_parity,
    )

    out = {r.nation: r for r in q_minby_maxby_parity(spark, SF).collect()}
    c = spark.read.parquet(f"{SF}/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    ref = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey")
        .collect()
    )
    for r in ref:
        assert out[r.c_nationkey].poorest_cust == r.c_custkey
