"""Unit tests for batch-20: TPC-H SQL surface + format round-trips."""

from __future__ import annotations


def test_tpch_q3_shapes(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline20 import q_sql_tpch_q3

    rows = q_sql_tpch_q3(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_q5_partitions_by_nation(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline20 import q_sql_tpch_q5

    rows = q_sql_tpch_q5(spark, "/root/testdata/sf0.001").collect()
    names = [r.n_name for r in rows]
    assert len(names) == len(set(names)) and all(r.revenue > 0 for r in rows)


def test_orc_and_csv_roundtrip_match(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline20 import (
        q_csv_roundtrip,
        q_orc_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    orc = {(r.n_regionkey, r.n, r.first_name) for r in q_orc_roundtrip(spark, sf).collect()}
    csv = {(r.n_regionkey, r.n, r.first_name) for r in q_csv_roundtrip(spark, sf).collect()}
    assert orc == csv and len(orc) == 5
