"""Pipeline batch 30: remaining SQL-surface parity corners —

- ``sql_collation_group``: Spark 4 string collations (``UTF8_LCASE``) —
  case-insensitive grouping without lower()-normalizing the stored
  data; the oracle mirrors with lower() since DuckDB lacks collated
  grouping. Grouping keys are emitted as deterministic min() reps.
- ``sql_parameterized``: named-parameter SQL (``spark.sql(sql, args)``)
  — the injection-safe templating surface (the reference interpolates
  query strings by hand, `get_data_from_apis_instance.py`; parameter
  markers are the engine-native replacement).
- ``sql_datetime_suite``: the date/time function surface (datediff,
  add_months, last_day, quarter, dayofweek, date_trunc) exercised as
  exact integer/string outputs on the order->ship latency path.

Environment note: Spark 4's ``transformWithStateInPandas`` (the
successor stateful API) requires ``google.protobuf`` for its state
server protocol; the package is absent in this container and installs
are off-limits, so the stateful tier is covered by
``applyInPandasWithState`` (streaming/stateful.py) — probed, crash
isolated to the protobuf import, documented rather than stubbed.

Scale notes: all three are single-shuffle group-bys or narrow passes;
collated grouping hashes the collation key exactly like a lower()
projection (no extra exchange), and parameter binding is a parse-time
substitution with zero runtime cost.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# mixed-case segment values: deterministically re-case from the key
_CASED_CTE = """
cased AS (
    SELECT c_custkey,
           CASE c_custkey % 3
               WHEN 0 THEN upper(c_mktsegment)
               WHEN 1 THEN lower(c_mktsegment)
               ELSE c_mktsegment END AS seg,
           c_acctbal
    FROM customer
)
"""

COLLATION_SQL = f"""
WITH {_CASED_CTE}
SELECT min(seg) AS seg_rep,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM cased
GROUP BY lower(seg)
"""


@register("sql_collation_group", oracle=COLLATION_SQL, covers=["A2", "O3"])
def q_sql_collation_group(spark, sf_dir):
    """Collation-aware aggregation: group mixed-case segment strings
    under UTF8_LCASE so 'AUTOMOBILE'/'automobile'/'Automobile' are one
    group, without materializing a normalized key column. The group
    key is re-emitted as min(seg) (binary collation) so both engines
    agree on the representative. Same single hash-shuffle as any
    group-by; the collation only changes the hash/equality function."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cased = cust.select(
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    return (
        cased.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.min(F.expr("collate(seg, 'UTF8_BINARY')")).alias("seg_rep"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)")).alias("bal_cents"),
        )
        .drop("k")
    )


PARAMETERIZED_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1996-01-01'
  AND o_totalprice > 1000.0
GROUP BY o_orderpriority
"""


@register("sql_parameterized", oracle=PARAMETERIZED_SQL, covers=["F16", "A2"])
def q_sql_parameterized(spark, sf_dir):
    """Named-parameter SQL: the filter constants arrive as bound
    parameters (:start, :cutoff, :min_price), never interpolated into
    the query string — the engine-native replacement for the
    reference's hand-built query templating (S3). Catalyst folds the
    bound literals, so pushdown/pruning behave exactly as with inline
    constants."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("_p_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM _p_orders
        WHERE o_orderdate >= :start
          AND o_orderdate < :cutoff
          AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={
            "start": "1995-01-01",
            "cutoff": "1996-01-01",
            "min_price": 1000.0,
        },
    )


DATETIME_SQL = """
SELECT o.o_orderkey,
       CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS ship_days,
       strftime(o.o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       CAST(last_day(o.o_orderdate) AS VARCHAR) AS month_end,
       CAST(quarter(o.o_orderdate) AS BIGINT) AS q,
       CAST(isodow(o.o_orderdate) AS BIGINT) AS iso_dow,
       CAST(date_trunc('month', l.l_shipdate) AS VARCHAR) AS ship_month
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber = 1
"""


@register("sql_datetime_suite", oracle=DATETIME_SQL, covers=["F16", "F11", "J1"])
def q_sql_datetime_suite(spark, sf_dir):
    """Date-function surface on the order->first-shipment path:
    datediff, add_months, last_day, quarter, ISO weekday, date_trunc —
    every output an exact integer or a formatted date string, so the
    cross-engine hash is bit-stable. One equi-join keyed on orderkey
    (the l_linenumber=1 filter is pushed to the lineitem scan)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_linenumber") == 1
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    # Spark weekday(): Monday=0 .. Sunday=6; ISO dow is Monday=1 .. 7
    return j.select(
        "o_orderkey",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("ship_days"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.date_trunc("month", "l_shipdate").cast("date").cast("string").alias(
            "ship_month"
        ),
    )
