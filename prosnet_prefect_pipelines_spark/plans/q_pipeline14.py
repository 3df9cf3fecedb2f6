"""Pipeline batch 14 (north-star extension): time-respecting
reachability, rolling-window aggregates, last-touch attribution, and an
l-diversity governance audit — each hash-matched against a DuckDB twin.

Determinism: arrivals/days/counts are pure integer arithmetic; the one
division (rolling mean) is rounded at 6 dp from integer operands.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import graph as G
from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- time-respecting reachability --------------------------------------------------------

# interaction graph from the event log: 100 nodes, edge (user%100 ->
# (user+event)%100) stamped with the event minute
_TEMPORAL_EDGES_SQL = """
e AS (
    SELECT user_id % 100 AS src,
           (user_id + event_id) % 100 AS dst,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS t
    FROM events
    WHERE user_id % 100 <> (user_id + event_id) % 100
)
"""

TEMPORAL_REACH_SQL = f"""
WITH RECURSIVE {_TEMPORAL_EDGES_SQL.strip()},
states AS (
    SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS t
    UNION
    SELECT e.dst AS node, e.t
    FROM states JOIN e ON e.src = states.node AND e.t >= states.t
)
SELECT node, CAST(MIN(t) AS BIGINT) AS arrival
FROM states GROUP BY node
"""


@register("temporal_reachability", oracle=TEMPORAL_REACH_SQL, covers=["J5", "T1"])
def q_temporal_reachability(spark, sf_dir):
    """Earliest-arrival reachability over the interaction log where
    paths must respect time (an edge fired before you arrived cannot
    carry you) — contact tracing / information diffusion. Frontier
    label-correcting relaxation (see graph.temporal_reachability); the
    oracle explores the full (node, time) state space by recursive CTE
    and takes the minimum — exponentially more states, same answer."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    minutes = (
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01 00:00:00")))
        / 60
    ).cast("long")
    edges = ev.select(
        (F.col("user_id") % 100).alias("src"),
        ((F.col("user_id") + F.col("event_id")) % 100).alias("dst"),
        minutes.alias("t"),
    ).filter(F.col("src") != F.col("dst"))
    return G.temporal_reachability(edges, sources=[0], start_time=0)


# --- rolling 7-day window aggregates -----------------------------------------------------

ROLLING_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, CAST(ts AS DATE) - DATE '1970-01-01'
)
SELECT event_type, day, n,
       CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS days_7d,
       round(CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS avg_7d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("rolling_window_avg", oracle=ROLLING_SQL, covers=["A2", "O1"])
def q_rolling_window_avg(spark, sf_dir):
    """7-day rolling event volume per type via a RANGE window over the
    integer day — RANGE (value-based) not ROWS, so gaps in the calendar
    shrink the window instead of silently widening it. One shuffle on
    the series key; the rolling mean divides exact integer operands."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("n_7d"),
        F.count(F.lit(1)).over(w).alias("days_7d"),
        F.round(F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w), 6).alias(
            "avg_7d"
        ),
    )


# --- last-touch attribution --------------------------------------------------------------

ATTRIBUTION_SQL = """
WITH purchases AS (
    SELECT event_id AS p_id, user_id,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS p_min
    FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT event_id AS c_id, user_id,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS c_min
    FROM events WHERE event_type = 'click'
),
joined AS (
    SELECT p.p_id, p.user_id, p.p_min, c.c_id, c.c_min,
           row_number() OVER (PARTITION BY p.p_id
                              ORDER BY c.c_min DESC, c.c_id DESC) AS rn
    FROM purchases p
    JOIN clicks c ON c.user_id = p.user_id
                 AND c.c_min <= p.p_min
                 AND c.c_min >= p.p_min - 7 * 24 * 60
)
SELECT p_id, user_id, p_min, c_id AS attributed_click, c_min AS click_min
FROM joined WHERE rn = 1
"""


@register("attribution_last_touch", oracle=ATTRIBUTION_SQL, covers=["J1", "O6"])
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 7-day lookback. The user-keyed join bounds
    pair generation to same-user event pairs (per-user quadratic —
    baskets are small); the per-purchase top-1 is one window. At 100 TB
    the same semantics run as the asof_join union-merge (no pair
    blow-up); this plan is the windowed variant that also yields ties
    deterministically."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    minutes = (
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01 00:00:00")))
        / 60
    ).cast("long")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", minutes.alias("p_min")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", minutes.alias("c_min")
    )
    joined = p.join(c, on="user_id").filter(
        (F.col("c_min") <= F.col("p_min"))
        & (F.col("c_min") >= F.col("p_min") - 7 * 24 * 60)
    )
    w = Window.partitionBy("p_id").orderBy(F.col("c_min").desc(), F.col("c_id").desc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "p_id",
            "user_id",
            "p_min",
            F.col("c_id").alias("attributed_click"),
            F.col("c_min").alias("click_min"),
        )
    )


# --- l-diversity audit -------------------------------------------------------------------

L_DIVERSITY_SQL = """
SELECT event_type,
       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(DISTINCT user_id % 10) AS BIGINT) AS n_sensitive,
       CASE WHEN COUNT(DISTINCT user_id % 10) < 5 THEN 1 ELSE 0 END AS under_l
FROM events
GROUP BY event_type, CAST(ts AS DATE) - DATE '1970-01-01'
"""


@register("l_diversity_audit", oracle=L_DIVERSITY_SQL, covers=["A1", "A2"])
def q_l_diversity_audit(spark, sf_dir):
    """l-diversity audit (k-anonymity's companion): per quasi-identifier
    group (event_type x day), count DISTINCT sensitive values and flag
    groups under l=5 — a group can be k-anonymous yet leak if everyone
    in it shares the sensitive value. One grouped distinct aggregation
    keyed on the quasi-identifier."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct(F.col("user_id") % 10).alias("n_sensitive"),
        F.when(F.countDistinct(F.col("user_id") % 10) < 5, 1)
        .otherwise(0)
        .cast("int")
        .alias("under_l"),
    )
