"""Pipeline batch 70 (north-star extension): ops/observability tier —
SLA breach reporting, error-budget burn, period-over-period rank
movers, duplicate-payment detection, and data-freshness lag.

Exactness discipline: latencies are integer day/microsecond
differences; burn rates and shares are truncating ppm; rank deltas are
exact window ranks with pinned tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# SLA breach report: order -> first ship latency vs a 30-day SLA.

SLA_SQL = """
WITH first_ship AS (
    SELECT l_orderkey, MIN(l_shipdate) AS ship0 FROM lineitem
    GROUP BY l_orderkey
),
lat AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(f.ship0 AS DATE))
               AS days
    FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches,
       CAST(CAST(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // COUNT(*) AS BIGINT) AS breach_ppm,
       CAST(MAX(days) AS BIGINT) AS worst_days
FROM lat GROUP BY priority
"""


@register("sla_breach_report", oracle=SLA_SQL, covers=["A2", "J1", "F16"])
def q_sla_breach_report(spark, sf_dir):
    """SLA breach report: order-to-first-shipment latency in exact
    integer days against a 30-day SLA, rolled up by order priority —
    breach counts, ppm rates, worst case. One min-aggregation on the
    fact table + one keyed join + one small rollup; the date math is
    datediff (integer days) in both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    lat = orders.join(
        first_ship, orders["o_orderkey"] == first_ship["l_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("ship0"), F.to_date("o_orderdate")).alias("days"),
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("days") > 30, 1).otherwise(0))
        .cast("long")
        .alias("n_breaches"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) AS DECIMAL(38,0))"
            " * 1000000 div COUNT(1) AS BIGINT)"
        ).alias("breach_ppm"),
        F.max("days").cast("long").alias("worst_days"),
    )


# ---------------------------------------------------------------------------
# error-budget burn per hour.

BURN_SQL = """
WITH h AS (
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
    FROM events
),
g AS (
    SELECT hour, COUNT(*) AS n, SUM(is_err) AS errs FROM h GROUP BY hour
)
SELECT hour, CAST(n AS BIGINT) AS n, CAST(errs AS BIGINT) AS errs,
       CAST(CAST(errs AS HUGEINT) * 1000000 // n AS BIGINT) AS err_ppm,
       CAST(SUM(errs) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_errs,
       CAST(SUM(n) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_n,
       CAST(CAST(SUM(errs) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)
                 AS HUGEINT) * 1000000
            // SUM(n) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_burn_ppm
FROM g
"""


@register("error_budget_burn", oracle=BURN_SQL, covers=["A2", "O1"])
def q_error_budget_burn(spark, sf_dir):
    """SRE error-budget burn: hourly error rate plus the running
    cumulative burn in truncating ppm — the burn-down curve an SLO
    dashboard plots against the budget line. The running window orders
    the HOURLY series (hours are bounded — days x 24 — so the single-
    partition cumulative sum is over a dimension-sized frame, never the
    raw events)."""
    ev = read_events(spark, sf_dir)
    h = ev.select(
        F.date_format(
            F.date_trunc("hour", F.timestamp_micros(F.col("ts_us"))),
            "yyyy-MM-dd HH:00",
        ).alias("hour"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    g = h.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_err").alias("errs")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "hour",
        F.col("n").cast("long").alias("n"),
        F.col("errs").cast("long").alias("errs"),
        F.expr("CAST(CAST(errs AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").alias(
            "err_ppm"
        ),
        F.sum("errs").over(w).cast("long").alias("cum_errs"),
        F.sum("n").over(w).cast("long").alias("cum_n"),
    ).withColumn(
        "cum_burn_ppm",
        F.expr("CAST(CAST(cum_errs AS DECIMAL(38,0)) * 1000000 div cum_n AS BIGINT)"),
    )


# ---------------------------------------------------------------------------
# period-over-period rank movers.

MOVERS_SQL = """
WITH rev AS (
    SELECT l_partkey % 100 AS grp,
           CASE WHEN CAST(l_shipdate AS DATE) < DATE '1996-01-01'
                THEN 'P1' ELSE 'P2' END AS period,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem GROUP BY grp, period
),
r AS (
    SELECT grp, period, cents,
           row_number() OVER (PARTITION BY period
                              ORDER BY cents DESC, grp) AS rnk
    FROM rev
),
j AS (
    SELECT a.grp, a.cents AS p1_cents, b.cents AS p2_cents,
           a.rnk AS p1_rank, b.rnk AS p2_rank
    FROM r a JOIN r b ON a.grp = b.grp AND a.period = 'P1' AND b.period = 'P2'
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(p1_rank AS BIGINT) AS p1_rank, CAST(p2_rank AS BIGINT) AS p2_rank,
       CAST(p1_rank - p2_rank AS BIGINT) AS rank_gain,
       CAST(p1_cents AS BIGINT) AS p1_cents, CAST(p2_cents AS BIGINT) AS p2_cents
FROM j
ORDER BY abs(p1_rank - p2_rank) DESC, grp LIMIT 15
"""


@register("rank_movers_report", oracle=MOVERS_SQL, covers=["A2", "O1", "O6"])
def q_rank_movers_report(spark, sf_dir):
    """Period-over-period rank movers: part-group revenue ranked within
    each half (split at 1996-01-01), the 15 groups with the largest
    rank swings — the 'biggest movers' report of any leaderboard. Ranks
    are windows over the bounded group dimension; the final top-15 is
    TakeOrdered on |delta| with a group tie-break."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        li.select(
            (F.col("l_partkey") % 100).alias("grp"),
            F.when(
                F.to_date("l_shipdate") < F.lit("1996-01-01").cast("date"), "P1"
            )
            .otherwise("P2")
            .alias("period"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .groupBy("grp", "period")
        .agg(F.sum("c").alias("cents"))
    )
    w = Window.partitionBy("period").orderBy(F.col("cents").desc(), F.col("grp"))
    r = rev.withColumn("rnk", F.row_number().over(w))
    a = r.filter(F.col("period") == "P1").select(
        "grp", F.col("cents").alias("p1_cents"), F.col("rnk").alias("p1_rank")
    )
    b = r.filter(F.col("period") == "P2").select(
        "grp", F.col("cents").alias("p2_cents"), F.col("rnk").alias("p2_rank")
    )
    j = a.join(b, "grp").select(
        F.col("grp").cast("long").alias("grp"),
        F.col("p1_rank").cast("long").alias("p1_rank"),
        F.col("p2_rank").cast("long").alias("p2_rank"),
        (F.col("p1_rank") - F.col("p2_rank")).cast("long").alias("rank_gain"),
        F.col("p1_cents").cast("long").alias("p1_cents"),
        F.col("p2_cents").cast("long").alias("p2_cents"),
    )
    return j.orderBy(F.abs(F.col("rank_gain")).desc(), F.col("grp")).limit(15)


# ---------------------------------------------------------------------------
# duplicate-payment candidates.

DUP_PAY_SQL = """
WITH e AS (
    SELECT event_id, user_id, CAST(round(value) AS BIGINT) AS dollars,
           epoch_us(ts) AS ts_us
    FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
)
SELECT CAST(a.event_id AS BIGINT) AS event_a,
       CAST(b.event_id AS BIGINT) AS event_b,
       CAST(a.user_id AS BIGINT) AS user_id,
       CAST(a.dollars AS BIGINT) AS dollars,
       CAST(b.ts_us - a.ts_us AS BIGINT) AS dt_us
FROM e a JOIN e b
  ON a.user_id = b.user_id AND a.dollars = b.dollars
 AND a.event_id < b.event_id
 AND abs(b.ts_us - a.ts_us) <= 604800000000
"""


@register("duplicate_payment_candidates", oracle=DUP_PAY_SQL, covers=["J1", "O6"])
def q_duplicate_payment_candidates(spark, sf_dir):
    """Duplicate-payment screen: purchase-event pairs from the same
    user with the same whole-dollar amount within ±7 days — the
    double-charge audit. The self-join keys on (user, rounded amount),
    so candidate pairs exist only for true amount collisions (never a
    cross join); the exact-microsecond window is a residual filter."""
    e = read_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.round(F.col("value")).cast("long").alias("dollars"),
        "ts_us",
    )
    a = e.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        "dollars",
        F.col("ts_us").alias("ta"),
    )
    b = e.select(
        F.col("event_id").alias("event_b"),
        "user_id",
        "dollars",
        F.col("ts_us").alias("tb"),
    )
    return (
        a.join(b, ["user_id", "dollars"])
        .filter(F.col("event_a") < F.col("event_b"))
        .filter(F.abs(F.col("tb") - F.col("ta")) <= 604_800_000_000)
        .select(
            F.col("event_a").cast("long"),
            F.col("event_b").cast("long"),
            F.col("user_id").cast("long"),
            F.col("dollars").cast("long"),
            (F.col("tb") - F.col("ta")).cast("long").alias("dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# data-freshness lag report.

FRESHNESS_SQL = """
WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
mx AS (SELECT MAX(ts_us) AS corpus_max FROM ev),
g AS (
    SELECT event_type, MAX(ts_us) AS last_ts, COUNT(*) AS n FROM ev
    GROUP BY event_type
)
SELECT g.event_type, CAST(g.n AS BIGINT) AS n,
       CAST(m.corpus_max - g.last_ts AS BIGINT) AS staleness_us,
       CAST(CASE WHEN m.corpus_max - g.last_ts > 86400000000 THEN 1 ELSE 0 END
            AS INT) AS stale_over_1d
FROM g CROSS JOIN mx m
"""


@register("freshness_report", oracle=FRESHNESS_SQL, covers=["A2"])
def q_freshness_report(spark, sf_dir):
    """Data-freshness lag: per event type, how far its newest record
    trails the corpus watermark (exact integer microseconds) with a
    >1-day staleness flag — the ingestion-health report a pipeline
    scheduler gates on. Two max-aggregations, one broadcast single-row
    join."""
    ev = read_events(spark, sf_dir)
    mx = ev.agg(F.max("ts_us").alias("corpus_max"))
    g = ev.groupBy("event_type").agg(
        F.max("ts_us").alias("last_ts"), F.count(F.lit(1)).alias("n")
    )
    return g.join(F.broadcast(mx)).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("corpus_max") - F.col("last_ts")).cast("long").alias("staleness_us"),
        F.when(
            F.col("corpus_max") - F.col("last_ts") > 86_400_000_000, 1
        )
        .otherwise(0)
        .cast("int")
        .alias("stale_over_1d"),
    )
