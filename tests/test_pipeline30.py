"""Unit tests for batch-30: collation grouping, parameterized SQL,
datetime function suite."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_collation_group_case_insensitive(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline30 import q_sql_collation_group

    rows = q_sql_collation_group(spark, SF).collect()
    assert rows
    # every mixed-case variant collapsed: reps unique case-insensitively
    lowered = [r.seg_rep.lower() for r in rows]
    assert len(lowered) == len(set(lowered))
    n_segments = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_mktsegment")
        .distinct()
        .count()
    )
    assert len(rows) == n_segments
    total = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.n for r in rows) == total


def test_parameterized_binding_matches_inline(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline30 import q_sql_parameterized

    got = {r.o_orderpriority: r for r in q_sql_parameterized(spark, SF).collect()}
    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("_t_orders")
    want = {
        r.o_orderpriority: r
        for r in spark.sql(
            """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM _t_orders
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
          AND o_totalprice > 1000.0
        GROUP BY o_orderpriority
        """
        ).collect()
    }
    assert got and {k: (v.n_orders, v.total_cents) for k, v in got.items()} == {
        k: (v.n_orders, v.total_cents) for k, v in want.items()
    }


def test_datetime_suite_field_semantics(spark):
    import datetime as dt

    from prosnet_prefect_pipelines_spark.plans.q_pipeline30 import q_sql_datetime_suite

    rows = q_sql_datetime_suite(spark, SF).collect()
    assert rows
    for r in rows[:200]:
        me = dt.date.fromisoformat(r.month_end)
        nxt = me + dt.timedelta(days=1)
        assert nxt.day == 1  # truly the last day of its month
        assert 1 <= r.q <= 4 and 1 <= r.iso_dow <= 7
        p3 = dt.date.fromisoformat(r.plus3m)
        sm = dt.date.fromisoformat(r.ship_month)
        assert sm.day == 1
        assert p3.month == (me.month + 2) % 12 + 1  # order month + 3, wrapped
