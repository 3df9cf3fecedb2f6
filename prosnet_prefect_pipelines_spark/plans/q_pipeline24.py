"""Pipeline batch 24 (north-star extension): SQL-surface parity — the
corners of ANSI SQL a reference user would expect the engine to speak,
each running the SAME (or near-identical) SQL text on Spark and DuckDB:

- GROUPING SETS multi-granularity rollups (one shuffle, no self-union)
- UNPIVOT (wide -> long without N unioned scans)
- INTERSECT / EXCEPT ALL bag set-operations
- correlated EXISTS / NOT EXISTS quantified predicates (null-safe
  semi/anti joins, not fragile NOT IN)
- LATERAL correlated top-n per row (DuckDB twin; Spark side uses the
  equivalent window-rank plan, which is what Catalyst rewrites
  LATERAL...LIMIT into anyway)

Scale notes: every query here compiles to a single-pass shuffle plan —
GROUPING SETS expands grouping keys map-side rather than re-scanning per
granularity; UNPIVOT is a narrow expand (no shuffle at all before the
sort); set-ops hash on the projected key only; EXISTS/NOT EXISTS become
left-semi/left-anti hash joins that broadcast the filtered orders side
when small and shuffle cleanly when not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register


def _views(spark, sf_dir, tables):
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# GROUPING SETS — portable: group keys are never NULL in lineitem, so the
# NULL markers grouping-sets emits are coalesced to a sentinel instead of
# relying on engine-specific GROUPING() bit orders.
GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("sql_grouping_sets", oracle=GROUPING_SETS_SQL, covers=["A2", "A6"])
def q_sql_grouping_sets(spark, sf_dir):
    """Multi-granularity totals in ONE aggregation: GROUPING SETS expands
    each input row to its grouping-key combinations map-side and shares a
    single shuffle — at 100 TB that is one pass over the fact table where
    a UNION-of-three-GROUP-BYs plan scans it three times. Decimal
    accumulate, double at the edge (order-independent)."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# UNPIVOT — SQL-standard syntax accepted verbatim by both engines.
UNPIVOT_SQL = """
SELECT p_partkey, attr, val
FROM (
    SELECT p_partkey,
           CAST(p_size AS DOUBLE) AS size,
           CAST(p_retailprice AS DOUBLE) AS retailprice
    FROM part
) wide
UNPIVOT (val FOR attr IN (size, retailprice))
"""


@register("sql_unpivot", oracle=UNPIVOT_SQL, covers=["P1", "P2"])
def q_sql_unpivot(spark, sf_dir):
    """Wide->long UNPIVOT as a narrow map-side expand (Spark compiles it
    to `Expand` — zero shuffles, zero extra scans), vs the naive
    N-branch UNION ALL that re-reads the table per attribute."""
    _views(spark, sf_dir, ["part"])
    return spark.sql(UNPIVOT_SQL)


# ---------------------------------------------------------------------------
# Set operations with bag semantics: which (nationkey, segment-ish) keys
# appear among customers but not suppliers, and the multiplicity-aware
# intersection of the two key bags. EXCEPT ALL / INTERSECT ALL hash on
# the projected key only — constant row width regardless of table width.
SET_OPS_SQL = """
SELECT 'both' AS side, nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
) i
UNION ALL
SELECT 'customer_only' AS side, nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
) e
"""


@register("sql_set_ops", oracle=SET_OPS_SQL, covers=["J3", "O5", "J7"])
def q_sql_set_ops(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL with true bag multiplicity (a nation
    with 40 customers and 3 suppliers keeps 3 'both' rows and 37
    'customer_only' rows). Both compile to count-and-replicate hash
    aggregations on the single projected column — one narrow shuffle
    each, no wide-row movement."""
    _views(spark, sf_dir, ["customer", "supplier"])
    return spark.sql(SET_OPS_SQL)


# ---------------------------------------------------------------------------
# Quantified predicates: EXISTS / NOT EXISTS are the null-safe way to
# express semi/anti joins in SQL (NOT IN collapses to empty on one NULL).
EXISTS_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
          AND o2.o_totalprice < 50000
      )
"""


@register("sql_exists_antijoin", oracle=EXISTS_SQL, covers=["J7", "S7"])
def q_sql_exists_antijoin(spark, sf_dir):
    """Correlated EXISTS + NOT EXISTS: Catalyst decorrelates both into a
    left-semi and a left-anti hash join against the pre-filtered orders
    projections (2 columns, filters pushed to the scan). The anti join is
    null-safe by construction — the 100 TB-safe form of 'NOT IN'."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(EXISTS_SQL)


# ---------------------------------------------------------------------------
# LATERAL top-n per customer. DuckDB runs the genuine LATERAL text; the
# Spark twin is the rank-window plan (row_number over a co-partitioned
# window), which is also the plan a LATERAL ... ORDER BY/LIMIT decorrelates
# into — same semantics, same single shuffle on o_custkey.
LATERAL_TOPN_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c,
LATERAL (
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@register("sql_lateral_topn", oracle=LATERAL_TOPN_SQL, covers=["O1", "O2", "J1"])
def q_sql_lateral_topn(spark, sf_dir):
    """Top-2 orders per customer. Executed as one window pass partitioned
    by o_custkey (rank <= 2) + an inner join back to customer — no
    per-customer re-scan of orders, no correlated loop; the orders side
    shuffles once on the join key it already ranked on."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price").desc(), F.col("o_orderkey")
    )
    top2 = (
        orders.select("o_custkey", "o_orderkey",
                      F.col("o_totalprice").cast("double").alias("price"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
    )
    return (
        customer.select("c_custkey")
        .join(top2, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "o_orderkey", "price")
    )
