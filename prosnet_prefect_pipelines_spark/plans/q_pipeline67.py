"""Pipeline batch 67 (north-star extension): SQL-surface parity — set
operations (INTERSECT/EXCEPT with ALL variants), correlated scalar
subqueries, time-grain rollups, the window VALUE-function family, and
ANSI NOT-IN null semantics.

These pin down the places where two ANSI engines most often diverge:
bag vs set semantics of set operators, correlated-subquery decorrelation,
date_trunc grain boundaries, window frame defaults for last_value, and
the three-valued logic of NOT IN against NULLs. Every query runs the
IDENTICAL SQL text (or exact relational twin) on both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register


def _views(spark, sf_dir, tables):
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# set operations: INTERSECT / EXCEPT / their ALL variants.

SETOPS_SQL = """
WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_custkey % 3 = 0),
     b AS (SELECT c_nationkey AS k FROM customer WHERE c_custkey % 5 = 0)
SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT k FROM a INTERSECT SELECT k FROM b) t
UNION ALL
SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT)
FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t
UNION ALL
SELECT 'except', CAST(COUNT(*) AS BIGINT)
FROM (SELECT k FROM a EXCEPT SELECT k FROM b) t
UNION ALL
SELECT 'except_all', CAST(COUNT(*) AS BIGINT)
FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t
"""


@register("sql_set_operations", oracle=SETOPS_SQL, covers=["O3", "O5", "J3"])
def q_sql_set_operations(spark, sf_dir):
    """INTERSECT / EXCEPT and their bag-semantics ALL variants between
    two derived key sets, counted — the same SQL text runs on both
    engines (ANSI set operators). INTERSECT ALL/EXCEPT ALL compile to
    multiplicity-tracking aggregations in Spark; the counts pin down
    that both engines agree on set vs bag semantics."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(SETOPS_SQL)


# ---------------------------------------------------------------------------
# correlated scalar subquery.

CORR_SCALAR_SQL = """
SELECT o.o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_max_orders,
       CAST(MAX(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM orders o
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) =
      (SELECT MAX(CAST(round(i.o_totalprice * 100) AS BIGINT))
       FROM orders i WHERE i.o_custkey = o.o_custkey)
GROUP BY o.o_custkey
"""


@register("sql_correlated_scalar", oracle=CORR_SCALAR_SQL, covers=["J1", "A2", "O6"])
def q_sql_correlated_scalar(spark, sf_dir):
    """Correlated scalar subquery: orders matching their customer's
    maximum order value (exact cents). Catalyst decorrelates the inner
    MAX into a keyed aggregation + join; DuckDB runs its own
    decorrelation — identical SQL text, two optimizers, same rows.
    n_max_orders > 1 marks customers whose max is tied."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(CORR_SCALAR_SQL)


# ---------------------------------------------------------------------------
# time-grain rollup matrix.

GRAIN_SQL = """
WITH ev AS (SELECT ts, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
g AS (
    SELECT 'hour' AS grain, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS bucket, cents FROM ev
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'), cents
    FROM ev
    UNION ALL
    SELECT 'week', strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S'), cents
    FROM ev
    UNION ALL
    SELECT 'month', strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S'), cents
    FROM ev
)
SELECT grain, bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM g GROUP BY grain, bucket
"""


@register("time_grain_rollup", oracle=GRAIN_SQL, covers=["A2", "F16"])
def q_time_grain_rollup(spark, sf_dir):
    """Event rollup at four calendar grains (hour/day/ISO-week/month)
    in one pass — the grain matrix a time-series dashboard materializes.
    Bucket labels are pinned to an explicit format so the engines
    compare bit-for-bit; week truncation is ISO (Monday) in both.
    One union fanout (4x, narrow) + a single grouped aggregation."""
    from prosnet_prefect_pipelines_spark.model import read_events

    ev = read_events(spark, sf_dir).select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    parts = [
        ev.select(
            F.lit(g).alias("grain"),
            F.date_format(F.date_trunc(g, "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket"
            ),
            "cents",
        )
        for g in ("hour", "day", "week", "month")
    ]
    g = parts[0]
    for p in parts[1:]:
        g = g.unionAll(p)
    return g.groupBy("grain", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# window VALUE functions: first/last/nth/lag/lead with explicit frames.

WINVAL_SQL = """
WITH c AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
)
SELECT c_custkey, c_nationkey, cents,
       CAST(first_value(c_custkey) OVER w AS BIGINT) AS poorest,
       CAST(last_value(c_custkey) OVER
            (PARTITION BY c_nationkey ORDER BY cents, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS BIGINT) AS richest,
       CAST(nth_value(c_custkey, 2) OVER
            (PARTITION BY c_nationkey ORDER BY cents, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS BIGINT) AS second_poorest,
       CAST(lag(cents, 1) OVER w AS BIGINT) AS prev_cents,
       CAST(lead(cents, 1) OVER w AS BIGINT) AS next_cents
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY cents, c_custkey)
"""


@register("window_value_suite", oracle=WINVAL_SQL, covers=["O1", "O6"])
def q_window_value_suite(spark, sf_dir):
    """The window VALUE-function family in one pass: first_value,
    last_value and nth_value over the FULL frame (the default
    RANGE..CURRENT ROW frame makes last_value a footgun — pinned to
    UNBOUNDED FOLLOWING explicitly), plus lag/lead. Identical SQL text
    on both engines; deterministic (cents, custkey) ordering."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(WINVAL_SQL)


# ---------------------------------------------------------------------------
# NOT IN three-valued logic.

NOTIN_SQL = """
WITH probe AS (SELECT c_custkey, c_nationkey FROM customer),
dirty AS (
    -- key list CONTAINING A NULL: ANSI three-valued logic makes
    -- `x NOT IN (..., NULL)` never TRUE, so the dirty anti-join is empty
    SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END AS k
    FROM nation WHERE n_nationkey < 5
),
clean AS (SELECT k FROM dirty WHERE k IS NOT NULL)
SELECT 'not_in_dirty' AS variant,
       CAST(COUNT(*) AS BIGINT) AS n
FROM probe WHERE c_nationkey NOT IN (SELECT k FROM dirty)
UNION ALL
SELECT 'not_in_clean', CAST(COUNT(*) AS BIGINT)
FROM probe WHERE c_nationkey NOT IN (SELECT k FROM clean)
UNION ALL
SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
FROM probe p
WHERE NOT EXISTS (SELECT 1 FROM dirty d WHERE d.k = p.c_nationkey)
"""


@register("sql_not_in_null_semantics", oracle=NOTIN_SQL, covers=["J7", "P7"])
def q_sql_not_in_null_semantics(spark, sf_dir):
    """ANSI NOT-IN three-valued logic, pinned: against a key list that
    contains a NULL, `NOT IN` can never be TRUE (count 0); against the
    NULL-filtered list it is a real anti-join; `NOT EXISTS` with an
    equality predicate ignores the NULL row and matches the clean
    variant. The classic silent-wrong-answer trap — both engines must
    agree on all three counts. Catalyst plans these as null-aware
    anti joins."""
    _views(spark, sf_dir, ["customer", "nation"])
    return spark.sql(NOTIN_SQL)
