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
