"""Pipeline batch 93 (north-star extension): calendar & behavior
profiles — month-end effects, business-hours shares, user burstiness,
customer lifespan histograms, and multiset (bag) diffs.

Exactness discipline: shares in truncating ppm; burstiness is the
integer index of dispersion; the bag diff uses EXCEPT ALL multiset
semantics in both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# month-end effect.

MONTH_END_SQL = """
WITH o AS (
    SELECT CASE WHEN EXTRACT(day FROM last_day(CAST(o_orderdate AS DATE)))
                     - EXTRACT(day FROM CAST(o_orderdate AS DATE)) < 3
                THEN 1 ELSE 0 END AS month_end,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (
    SELECT month_end, COUNT(*) AS n, SUM(cents) AS cents FROM o
    GROUP BY month_end
)
SELECT CAST(month_end AS INT) AS month_end,
       CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS BIGINT) AS cents,
       CAST(CAST(cents AS HUGEINT) // n AS BIGINT) AS mean_cents
FROM g
"""


@register("month_end_effect", oracle=MONTH_END_SQL, covers=["A2", "F16"])
def q_month_end_effect(spark, sf_dir):
    """Month-end effect: orders landing in the last 3 days of their
    calendar month vs the rest (last_day arithmetic — the month-length-
    aware cut) with mean order values — the quota-cycle screen sales
    audits run. One narrow pass + a two-row rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = F.to_date("o_orderdate")
    month_end = F.when(
        F.dayofmonth(F.last_day(d)) - F.dayofmonth(d) < 3, 1
    ).otherwise(0)
    src = o.select(
        month_end.alias("month_end"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return src.groupBy("month_end").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
        F.expr(
            "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) div COUNT(1) AS BIGINT)"
        ).alias("mean_cents"),
    ).select(
        F.col("month_end").cast("int").alias("month_end"),
        "n_orders",
        "cents",
        "mean_cents",
    )


# ---------------------------------------------------------------------------
# business-hours share per event type.

BIZ_HOURS_SQL = """
WITH ev AS (
    SELECT event_type,
           CASE WHEN EXTRACT(hour FROM ts) BETWEEN 9 AND 16 THEN 1 ELSE 0 END
               AS biz
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(biz) AS BIGINT) AS n_business_hours,
       CAST(CAST(SUM(biz) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
           AS business_share_ppm
FROM ev GROUP BY event_type
"""


@register("business_hours_share", oracle=BIZ_HOURS_SQL, covers=["A2", "F16"])
def q_business_hours_share(spark, sf_dir):
    """Business-hours share: the ppm of each event type landing in the
    09:00-16:59 UTC window — the workload-placement profile (human vs
    automated traffic separates sharply on it). One narrow extraction +
    one rollup."""
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.when(
            F.hour(F.timestamp_micros(F.col("ts_us"))).between(9, 16), 1
        )
        .otherwise(0)
        .alias("biz"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("biz").cast("long").alias("n_business_hours"),
        F.expr(
            "CAST(CAST(SUM(biz) AS DECIMAL(38,0)) * 1000000 div COUNT(1) "
            "AS BIGINT)"
        ).alias("business_share_ppm"),
    )


# ---------------------------------------------------------------------------
# user burstiness (index of dispersion over hourly counts).

BURSTINESS_SQL = """
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS c
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id, h
),
s AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sm, CAST(SUM(c * c) AS BIGINT) AS ss
    FROM hourly GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_active_hours,
       CAST(sm AS BIGINT) AS n_events,
       CAST((CAST(n AS HUGEINT) * ss - CAST(sm AS HUGEINT) * sm) * 1000000
            // (CAST(n AS HUGEINT) * sm) AS BIGINT) AS dispersion_ppm
FROM s WHERE n >= 2
"""


@register("user_burstiness", oracle=BURSTINESS_SQL, covers=["A2"])
def q_user_burstiness(spark, sf_dir):
    """User burstiness: the index of dispersion (variance/mean in ppm)
    of each user's ACTIVE-hour event counts — Poisson-like users sit
    near 1e6, bursty users far above — the behavioral fingerprint that
    separates humans from schedulers. Integer dispersion, no sqrt;
    two stacked keyed aggregations."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    hourly = ev.select(
        "user_id",
        F.date_trunc("hour", F.timestamp_micros(F.col("ts_us"))).alias("h"),
    ).groupBy("user_id", "h").agg(F.count(F.lit(1)).alias("c"))
    s = hourly.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sm"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    return s.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").alias("n_active_hours"),
        F.col("sm").alias("n_events"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * ss - CAST(sm AS DECIMAL(38,0))"
            " * sm) * 1000000 div (CAST(n AS DECIMAL(38,0)) * sm) AS BIGINT)"
        ).alias("dispersion_ppm"),
    )


# ---------------------------------------------------------------------------
# customer lifespan histogram.

LIFESPAN_SQL = """
WITH span AS (
    SELECT o_custkey,
           date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS days
    FROM orders GROUP BY o_custkey
)
SELECT CAST(days // 180 AS BIGINT) AS half_year_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(days) AS BIGINT) AS min_days,
       CAST(MAX(days) AS BIGINT) AS max_days
FROM span GROUP BY half_year_bucket
"""


@register("customer_lifespan_histogram", oracle=LIFESPAN_SQL, covers=["A2"])
def q_customer_lifespan_histogram(spark, sf_dir):
    """Customer lifespan distribution: first-to-last order spans in
    exact days, bucketed by half-years — the relationship-length
    histogram retention economics start from (bucket 0 = one-shot or
    short-lived customers). One min/max rollup + a bounded-bucket
    regroup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    span = o.groupBy("o_custkey").agg(
        F.datediff(
            F.max(F.to_date("o_orderdate")), F.min(F.to_date("o_orderdate"))
        ).alias("days")
    )
    return span.select(
        F.expr("CAST(days div 180 AS BIGINT)").alias("half_year_bucket"),
        "days",
    ).groupBy("half_year_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# multiset (bag) diff.

BAG_DIFF_SQL = """
WITH a AS (
    SELECT c_nationkey AS k, c_mktsegment AS seg FROM customer
    WHERE c_custkey % 3 <> 0
),
b AS (
    SELECT c_nationkey AS k, c_mktsegment AS seg FROM customer
    WHERE c_custkey % 5 <> 0
),
only_a AS (SELECT k, seg FROM a EXCEPT ALL SELECT k, seg FROM b),
only_b AS (SELECT k, seg FROM b EXCEPT ALL SELECT k, seg FROM a)
SELECT 'only_in_a' AS side, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
FROM only_a
UNION ALL
SELECT 'only_in_b', CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT k) AS BIGINT)
FROM only_b
"""


@register("bag_diff_report", oracle=BAG_DIFF_SQL, covers=["O5", "O3", "A1"])
def q_bag_diff_report(spark, sf_dir):
    """Multiset diff: EXCEPT ALL in both directions between two derived
    samples — BAG semantics count duplicate-multiplicity differences
    that a set-based EXCEPT silently collapses (two copies in A, one in
    B leaves one residual row). The data-diff primitive for tables
    without a key; identical SQL text on both engines."""
    for t in ("customer",):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(BAG_DIFF_SQL)
