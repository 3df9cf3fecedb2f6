"""Unit tests for batch-46: derived-table TPC-H completion."""

from __future__ import annotations

SF = "/root/testdata/sf0.01"  # Q2/Q21 are empty at sf0.001 — use 0.01


def test_derived_partsupp_shape(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline20 import _register_views
    from prosnet_prefect_pipelines_spark.plans.q_pipeline46 import _DERIVED

    _register_views(spark, SF, ["part", "supplier", "nation", "region",
                                "orders", "lineitem", "customer"])
    ps = spark.sql(f"WITH {_DERIVED} SELECT * FROM partsupp")
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    rows = ps.collect()
    assert len(rows) == 4 * n_parts  # exactly 4 suppliers per part
    per_part: dict[int, set] = {}
    for r in rows:
        assert 0 <= r.ps_suppkey < 100
        assert r.ps_availqty >= 1 and r.ps_supplycost_cents >= 100
        per_part.setdefault(r.ps_partkey, set()).add(r.ps_suppkey)
    assert all(len(s) == 4 for s in per_part.values())  # distinct suppliers


def test_q4_exists_semantics(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline46 import _ALL, _make

    q4 = _make("sql_tpch_q4", _ALL["sql_tpch_q4"][0])
    got = {r.o_orderpriority: r.order_count for r in q4(spark, SF).collect()}
    assert got
    total_window = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= "1995-07-01")
            & (F.col("o_orderdate") < "1995-10-01")
        )
        .count()
    )
    assert 0 < sum(got.values()) <= total_window


def test_q21_waiting_supplier_definition(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline46 import _ALL, _make

    q21 = _make("sql_tpch_q21", _ALL["sql_tpch_q21"][0])
    rows = q21(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.numwait >= 1 and r.s_name.startswith("Supplier#")
