"""Incremental + windowing queries over the events table (SURVEY §2.10 +
streaming capability extension). All time arithmetic on exact
epoch-microseconds (DuckDB twin: epoch_us)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.streaming import incremental as I
from prosnet_prefect_pipelines_spark.streaming import windows as W

# all event-time arithmetic in exact microseconds: DuckDB's parquet reader
# truncates the file's nanosecond timestamps to its microsecond TIMESTAMP,
# and Spark mirrors with ts_us = ts div 1000 (model.read_events)
US_DAY = 86_400 * 1_000_000
US_HOUR = 3_600 * 1_000_000
US_30M = 1_800 * 1_000_000
US_15M = 900 * 1_000_000

INCREMENTAL_SQL = f"""
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events
WHERE epoch_us(ts) > (SELECT max(epoch_us(ts)) FROM events) - {2 * US_DAY}
"""


@register("incremental_window", oracle=INCREMENTAL_SQL, covers=["T1", "F17", "S3"])
def q_incremental_window(spark, sf_dir):
    """T1: high-watermark incremental window (dateModified > now - 2 days,
    wikidata_index.py:159-167) anchored on data max for determinism."""
    ev = read_events(spark, sf_dir)
    return I.incremental_window(ev, "ts_us", 2).select(
        "event_id", "user_id", "event_type", "ts_us"
    )


UPSERT_SQL = f"""
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
    FROM events
    WHERE epoch_us(ts) > (SELECT max(epoch_us(ts)) FROM events) - {2 * US_DAY}
) t WHERE rn = 1
"""


@register("incremental_upsert", oracle=UPSERT_SQL, covers=["T2", "T3", "K2"])
def q_incremental_upsert(spark, sf_dir):
    """T2: idempotent upsert = last-write-wins per key within the re-read
    window (push_to_typesense.py:49-51 upsert semantics)."""
    ev = I.incremental_window(read_events(spark, sf_dir), "ts_us", 2)
    return I.upsert_dedup(ev, ["user_id"], "ts_us", "event_id").select(
        "user_id", "event_id", "event_type", "ts_us"
    )


TUMBLING_SQL = f"""
SELECT epoch_us(ts) - epoch_us(ts) % {US_HOUR} AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("tumbling_window", oracle=TUMBLING_SQL, covers=["T1"])
def q_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time windows (streaming twin:
    F.window(ts, '1 hour') — see tests/test_streaming.py)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.withColumn("window_start", W.tumble(F.col("ts_us"), US_HOUR))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


SLIDING_SQL = f"""
WITH expanded AS (
    SELECT t.*, s.window_start
    FROM (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events) t,
    LATERAL (
        SELECT unnest([
            ts_us - ts_us % {US_30M},
            ts_us - ts_us % {US_30M} - {US_30M}
        ]) AS window_start
    ) s
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY 1, 2
"""


@register("sliding_window", oracle=SLIDING_SQL, covers=["T1"])
def q_sliding_window(spark, sf_dir):
    """Sliding 1-hour windows every 30 minutes: explode into the 2 covering
    windows then aggregate (Spark's built-in window expansion, made exact
    over nanos)."""
    ev = read_events(spark, sf_dir).select("event_type", "value", "ts_us")
    return (
        W.sliding_windows(ev, "ts_us", US_HOUR, US_30M)
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


SESSION_SQL = f"""
WITH flagged AS (
    SELECT user_id, epoch_us(ts) AS ts_us, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts)) > {US_15M}
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts_us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       min(ts_us) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("session_window", oracle=SESSION_SQL, covers=["T1", "T3"])
def q_session_window(spark, sf_dir):
    """Batch sessionization with a 15-minute inactivity gap (streaming
    twin: F.session_window)."""
    ev = read_events(spark, sf_dir)
    sess = W.sessionize(ev, ["user_id"], "ts_us", US_15M)
    return sess.groupBy("user_id", "session_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    ).select("user_id",
             F.col("session_start"),
             "n_events", "total_value")


MATVIEW_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
"""


@register("incremental_matview", oracle=MATVIEW_SQL, covers=["T1", "T2"])
def q_incremental_matview(spark, sf_dir):
    """Incrementally-maintained materialized aggregate: the events table
    arrives as three batches, each refresh combines the batch's PARTIAL
    aggregate with the stored rollup and atomically swaps it — per
    refresh, work is |batch| + |distinct keys|, never the full history.
    After all batches the store equals the from-scratch oracle exactly
    (decimal sums — refresh order cannot perturb values)."""
    import os
    import shutil
    import tempfile

    ev = read_events(spark, sf_dir).select(
        "event_id", "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    base = private_stage_dir(
        f"matview_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    for p in (base, f"{base}.tmp", f"{base}.old"):
        shutil.rmtree(p, ignore_errors=True)
    out = None
    for b in range(3):
        batch = ev.filter(F.col("event_id") % 3 == b)
        out = I.refresh_materialized_agg(
            spark, base, batch, ["event_type"], sum_cols={"total_value": "value"}
        )
    return out.select(
        "event_type", "n", F.col("total_value").cast("double").alias("total_value")
    )
