"""Temporal-join queries over the events table (capability extension —
the reference has no as-of/range joins, SURVEY §2.3 note; a 100 TB event
pipeline needs both). Oracles are independent implementations: DuckDB's
native ASOF JOIN engine and a plain BETWEEN theta join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.operators import temporal as T
from prosnet_prefect_pipelines_spark.plans.catalog import register

US_HOUR = 3_600 * 1_000_000

ASOF_SQL = """
WITH ev AS (
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
),
l AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'click')
SELECT l.event_id, l.user_id, l.ts_us, l.value,
       r.ts_us AS asof_ts, r.event_id AS asof_event_id, r.value AS asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
"""


@register("asof_join", oracle=ASOF_SQL, covers=["J1", "J2"])
def q_asof_join(spark, sf_dir):
    """Each purchase matched to the user's latest click at-or-before it —
    single-shuffle union + running-last window, checked against DuckDB's
    native ASOF JOIN (an independent merge-join implementation)."""
    ev = read_events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", "value"
    )
    return T.as_of_join(
        left, right, ["user_id"], "ts_us", "ts_us",
        right_cols=["event_id", "value"], prefix="asof_",
    ).select(
        "event_id", "user_id", "ts_us", "value",
        F.col("asof_ts"),
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


RANGE_SQL = f"""
WITH ev AS (
    SELECT event_id, event_type, value, epoch_us(ts) AS ts_us FROM events
),
points AS (SELECT event_id, ts_us FROM ev WHERE event_type = 'view'),
iv AS (
    SELECT event_id AS purchase_id, value,
           ts_us - {US_HOUR} AS lo, ts_us + {US_HOUR} AS hi
    FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(iv.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM points p JOIN iv ON p.ts_us BETWEEN iv.lo AND iv.hi
GROUP BY p.event_id
"""


@register("range_join", oracle=RANGE_SQL, covers=["J1"])
def q_range_join(spark, sf_dir):
    """Views within +-1h of any purchase: bucketized range join (interval
    explode onto an hour grid -> equi-shuffle on bucket -> exact residual
    BETWEEN), aggregated per view. The oracle is the naive theta join."""
    ev = read_events(spark, sf_dir)
    points = ev.filter(F.col("event_type") == "view").select("event_id", "ts_us")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "value",
        (F.col("ts_us") - US_HOUR).alias("lo"),
        (F.col("ts_us") + US_HOUR).alias("hi"),
    )
    joined = T.range_join(points, iv, "ts_us", "lo", "hi", bucket_width=US_HOUR)
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


FUNNEL_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (
    SELECT e.user_id, MIN(e.ts_us) AS c_ts
    FROM ev e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts_us >= v.v_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts_us) AS p_ts
    FROM ev e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts_us >= c.c_ts
    GROUP BY e.user_id
)
SELECT stage, n_users FROM (
    SELECT 1 AS ord, 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 2, 'view>click', COUNT(*) FROM c
    UNION ALL
    SELECT 3, 'view>click>purchase', COUNT(*) FROM p
) t
"""


@register("funnel_conversion", oracle=FUNNEL_SQL, covers=["A2", "J1"])
def q_funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel (first view -> first click after it ->
    first purchase after that): per-stage user counts via keyed min
    aggregations + equi-joins on user_id — every stage is a partial+final
    integer MIN, every join is keyed, nothing sorts globally. The
    event-sequence analytics shape a product pipeline runs daily."""
    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    def stage(df, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "view")
        .unionByName(stage(c, "view>click"))
        .unionByName(stage(p, "view>click>purchase"))
    )


SCD2_SQL = """
SELECT user_id, event_type AS state, ts_us AS valid_from,
       lead(ts_us) OVER w AS valid_to,
       CAST(CASE WHEN lead(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
           AS is_current
FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events) t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


@register("scd2_user_state", oracle=SCD2_SQL, covers=["T2", "O1"])
def q_scd2_user_state(spark, sf_dir):
    """Type-2 slowly-changing dimension built from the event log: each
    event opens a state interval closed by the user's next event
    (valid_from / valid_to half-open intervals, is_current on the tail).
    One keyed window (partition user_id, order ts_us + event_id
    tiebreak) — a single shuffle on the dimension key; the standard
    warehouse dimension-build re-expressed as a window pass."""
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts_us", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


US_DAY = 24 * US_HOUR
US_WEEK = 7 * US_DAY

COHORT_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
signup AS (
    SELECT user_id, MIN(ts_us) // {US_WEEK} AS cohort_week
    FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, s.cohort_week,
           (e.ts_us // {US_WEEK}) - s.cohort_week AS week_offset
    FROM ev e JOIN signup s ON s.user_id = e.user_id
    WHERE e.ts_us // {US_WEEK} >= s.cohort_week
)
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM activity GROUP BY cohort_week, week_offset
"""


@register("cohort_retention", oracle=COHORT_SQL, covers=["A1", "A2", "J1"])
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users bucketed by signup week, counted once per
    (cohort, weeks-since-signup) they were active in. Epoch-week
    arithmetic is pure integer division; the distinct + count pair is
    two keyed partial+final aggregations; the signup table joins on the
    user key (broadcastable when cohorts are computed per tenant)."""
    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.expr(f"min(ts_us) div {US_WEEK}").alias("cohort_week"))
    )
    activity = (
        ev.join(signup, "user_id")
        .withColumn("week_offset", F.expr(f"ts_us div {US_WEEK}") - F.col("cohort_week"))
        .filter(F.col("week_offset") >= 0)
        .select("user_id", "cohort_week", "week_offset")
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


HISTOGRAM_SQL = """
SELECT event_type,
       CAST(floor(value / 10.0) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events
GROUP BY event_type, bin
"""


@register("value_histogram", oracle=HISTOGRAM_SQL, covers=["A2"])
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values per type with an exact
    scaled-integer mass column — one partial+final aggregation keyed by
    (type, bin); bin assignment is a narrow floor-division projection
    that pushes into the scan's project."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(10.0)).cast("long").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")).alias("sum_value_e6"),
        )
    )


TRENDING_SQL = f"""
WITH counts AS (
    SELECT epoch_us(ts) // {US_WEEK} AS week, event_type, COUNT(*) AS n
    FROM events GROUP BY week, event_type
)
SELECT week, event_type, n, rn FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY week ORDER BY n DESC, event_type) AS INT) AS rn
    FROM counts
) t WHERE rn <= 3
"""


@register("trending_topk", oracle=TRENDING_SQL, covers=["A2", "O6", "O1"])
def q_trending_topk(spark, sf_dir):
    """Top-3 event types per epoch week — the trending/leaderboard
    shape: one partial+final count keyed by (week, type), then a window
    ranked WITHIN each week (keyed partitions, no global sort);
    deterministic tiebreak on the type name."""
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir)
    counts = ev.groupBy(
        F.expr(f"ts_us div {US_WEEK}").alias("week"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("week").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("week", "event_type", "n", "rn")
    )


RUNNING_SQL = """
SELECT user_id, event_id, ts_us,
       CAST(SUM(v6) OVER w AS BIGINT) AS cum_value_e6,
       CAST(COUNT(*) OVER w AS BIGINT) AS cum_events
FROM (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events
) t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("running_totals", oracle=RUNNING_SQL, covers=["A5", "O1"])
def q_running_totals(spark, sf_dir):
    """Per-user running value sum + event count over event time — the
    cumulative-metrics window shape. Values are summed as scaled
    BIGINTs (exact, prefix-order-defined by the ts+id sort), one keyed
    window shuffle on user_id."""
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v6 = F.round(F.col("value") * 1_000_000, 0).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum(v6).over(w).cast("long").alias("cum_value_e6"),
        F.count(F.lit(1)).over(w).cast("long").alias("cum_events"),
    )


JSON_PROPS_SQL = """
SELECT event_id, user_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
FROM events
"""


@register("json_extract_props", oracle=JSON_PROPS_SQL, covers=["F21", "P4"])
def q_json_extract_props(spark, sf_dir):
    """Semi-structured payload extraction: a JSON path pulled out of the
    props string column (typed, with null for absent paths) — pure
    narrow projection via get_json_object, no UDF, pushes into the
    scan's project."""
    from prosnet_prefect_pipelines_spark.model import read_events

    ev = read_events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing"),
    )
