"""Pipeline batch 38: warehouse temporal-correctness ops —

- ``scd2_pit_join``: point-in-time dimension join. The SCD2 user-state
  dimension is built from profile events (signup/click/view); purchase
  facts then join to the state that was valid AT the purchase time —
  never a later one (the no-future-leakage rule that separates a
  correct training feature join from a leaky one). Implemented
  Spark-first as the union + running-last-state window (one shuffle on
  the user key, no range product) — the same merge shape as the as-of
  join operator (operators/temporal.py).
- ``attribution_time_decay``: time-decay attribution — each purchase
  credits its preceding touches (clicks/views within 7 days) with
  geometrically halving weights, most recent touch first. Shares are
  exact integers: touch j-from-last gets 2^(n-1-j) parts of (2^n - 1),
  emitted in ppm. Complements ``attribution_last_touch`` (the other
  published model) so the two can be compared query-for-query.

Scale notes: the PIT join is one user-keyed window over dim+fact rows
interleaved by time (dim sorts before fact at equal timestamps) —
linear, no per-fact probing. Attribution joins touches to purchases
per user (keyed join + residual 7-day filter; per-user event counts
are bounded) and ranks within each purchase — a purchase-keyed window.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

_US_DAY = 86_400_000_000

PIT_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
dim AS (
    SELECT user_id, event_type AS state, ts_us AS valid_from
    FROM ev WHERE event_type IN ('signup', 'click', 'view')
),
facts AS (
    SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'
)
SELECT f.user_id, f.event_id, f.ts_us,
       (SELECT d.state FROM dim d
        WHERE d.user_id = f.user_id AND d.valid_from <= f.ts_us
        ORDER BY d.valid_from DESC LIMIT 1) AS state_at_purchase
FROM facts f
"""


@register("scd2_pit_join", oracle=PIT_SQL, covers=["T2", "J2", "O1"])
def q_scd2_pit_join(spark, sf_dir):
    """Point-in-time join: each purchase sees the LAST profile state at
    or before its timestamp, or NULL if none existed yet — no future
    state can leak backward. Union dim + fact rows, one user-keyed
    window ordered (ts, dim-before-fact), running last_value(state,
    ignorenulls) — linear merge, zero range joins (the oracle's
    correlated subquery is the semantic spec, not the plan)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    dim = ev.filter(F.col("event_type").isin("signup", "click", "view")).select(
        "user_id",
        F.col("ts_us").alias("t"),
        F.lit(1).alias("is_dim"),
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("event_id"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("t"),
        F.lit(0).alias("is_dim"),
        F.lit(None).cast("string").alias("state"),
        "event_id",
    )
    merged = dim.unionAll(facts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "state_at_purchase", F.last("state", ignorenulls=True).over(w)
        )
        .filter(F.col("is_dim") == 0)
        .select(
            "user_id",
            "event_id",
            F.col("t").alias("ts_us"),
            "state_at_purchase",
        )
    )


_WINDOW_DAYS = 7
_MAX_TOUCHES = 20

DECAY_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
conv AS (SELECT user_id, event_id AS conv_id, ts_us AS conv_ts FROM ev
         WHERE event_type = 'purchase'),
touch AS (SELECT user_id, event_id AS touch_id, ts_us AS touch_ts, event_type
          FROM ev WHERE event_type IN ('click', 'view')),
paired AS (
    SELECT c.user_id, c.conv_id, t.touch_id, t.event_type, t.touch_ts,
           row_number() OVER (PARTITION BY c.conv_id
                              ORDER BY t.touch_ts DESC, t.touch_id DESC) AS r
    FROM conv c JOIN touch t
      ON t.user_id = c.user_id
     AND t.touch_ts <= c.conv_ts
     AND t.touch_ts > c.conv_ts - {_WINDOW_DAYS * _US_DAY}
),
capped AS (
    SELECT *, CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
    FROM paired WHERE r <= {_MAX_TOUCHES}
)
SELECT user_id, conv_id, touch_id, event_type,
       CAST(r AS BIGINT) AS recency_rank,
       -- touch at recency r gets 2^(n-r) parts of (2^n - 1), in ppm
       CAST((CAST(1 AS HUGEINT) << (n - r)) * 1000000
            // ((CAST(1 AS HUGEINT) << n) - 1) AS BIGINT) AS share_ppm
FROM capped
"""


@register("attribution_time_decay", oracle=DECAY_SQL, covers=["J1", "A2", "O6"])
def q_attribution_time_decay(spark, sf_dir):
    """Time-decay attribution: within each purchase's 7-day lookback,
    touches receive geometrically halving credit (most recent first),
    as exact integer shares of (2^n - 1) in ppm — shares of one
    conversion sum to ~1e6 with no floats anywhere. User-keyed join +
    residual window filter (per-user touch lists are bounded), then one
    conversion-keyed window for recency ranks; the 20-touch cap bounds
    the shift arithmetic and the worst-case credit list."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("ts_us").alias("conv_ts")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts_us").alias("touch_ts"),
        "event_type",
    )
    paired = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_ts") <= F.col("conv_ts"))
            & (F.col("touch_ts") > F.col("conv_ts") - _WINDOW_DAYS * _US_DAY)
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy(
                    F.col("touch_ts").desc(), F.col("touch_id").desc()
                )
            ),
        )
        .filter(F.col("r") <= _MAX_TOUCHES)
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("conv_id")).cast("long")
        )
    )
    return paired.select(
        "user_id",
        "conv_id",
        "touch_id",
        "event_type",
        F.col("r").cast("long").alias("recency_rank"),
        F.expr(
            "CAST(CAST(shiftleft(CAST(1 AS BIGINT), CAST(n - r AS INT)) AS DECIMAL(38,0))"
            " * 1000000 div (CAST(shiftleft(CAST(1 AS BIGINT), CAST(n AS INT))"
            " AS DECIMAL(38,0)) - 1) AS BIGINT)"
        ).alias("share_ppm"),
    )
