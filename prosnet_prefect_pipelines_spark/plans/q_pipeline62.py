"""Pipeline batch 62: engagement rollups — rolling active users.

- ``rolling_active_users``: per day, DAU (distinct users that day),
  trailing-7-day WAU (distinct users in the window), and the
  DAU/WAU stickiness ratio in exact integer ppm. Rolling DISTINCT
  doesn't decompose into a window aggregate, so the plan materializes
  distinct (user, day) pairs once and explodes each into the <=7
  window days it counts toward — a bounded fanout followed by two
  keyed distinct-counts. The dashboard query every engagement report
  starts from.

Scale notes: the fanout is bounded by the window length (7x on
already-deduplicated (user, day) rows, not raw events); both counts
are hash-partitioned by day with partial aggregation; no self-join
over the raw event stream and no global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

WINDOW_DAYS = 7

RAU_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
    FROM events WHERE user_id IS NOT NULL
),
dau AS (
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM ud GROUP BY day
),
spread AS (
    SELECT ud.user_id, ud.day + CAST(o.off AS INT) AS wday
    FROM ud, generate_series(0, {WINDOW_DAYS - 1}) o(off)
),
wau AS (
    SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM spread GROUP BY wday
)
SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
       d.dau * 1000000 // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON w.day = d.day
"""


@register("rolling_active_users", oracle=RAU_SQL, covers=["A1", "A2", "J1"])
def q_rolling_active_users(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness ppm per day. Distinct
    (user, day) pairs materialize once; the 7-day window comes from a
    bounded explode of those pairs (window length x deduped rows, not
    raw events), then two keyed distinct-counts. Days with no events
    in the trailing week simply don't appear (join on DAU days)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    spread = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(WINDOW_DAYS - 1))).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
    wau = spread.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .withColumn("stickiness_ppm", F.expr("(dau * 1000000) div wau"))
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            "stickiness_ppm",
        )
    )
