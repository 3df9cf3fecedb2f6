"""Pipeline batch 40: time-series ETL utilities —

- ``date_dimension_spine``: the generated calendar dimension every
  warehouse joins against (day -> iso dow/week parts, month ends,
  weekend flag) — built from sequence(), no source table at all.
- ``locf_fill``: last-observation-carried-forward onto an hourly grid:
  each user's value series is resampled to every hour of its active
  range, missing hours filled from the last prior observation. The
  grid is a per-user sequence explode; the fill is one keyed
  last(ignorenulls) window — the standard gap-fill with zero joins
  beyond the grid attach.
- ``stock_balance_clamped``: clamped running balance (stock can never
  go below zero: a withdrawal against empty stock is lost, NOT
  carried as debt). This fold is genuinely sequential — no window
  function expresses max(0, acc + delta) composed left-to-right — so
  it runs in the sanctioned escape hatch: ``applyInPandas`` per key,
  vectorized inside the group. The DuckDB twin folds the same ordered
  deltas with list_reduce, proving the Arrow path bit-exact.

Scale notes: the spine is O(days); LOCF explodes user x active-hours
(bounded by range, keyed windows); the clamped fold shuffles once on
the group key and state is one scalar per key — the applyInPandas
contract scales with group count, and groups are processed
Arrow-batched, not row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

_SPINE_LO, _SPINE_HI = "1995-01-01", "1996-12-31"

SPINE_SQL = f"""
SELECT CAST(d AS VARCHAR) AS day,
       CAST(isodow(d) AS BIGINT) AS iso_dow,
       CAST(isodow(d) IN (6, 7) AS BOOLEAN) AS is_weekend,
       CAST(strftime(d, '%Y%m') AS BIGINT) AS month_key,
       CAST(quarter(d) AS BIGINT) AS q,
       CAST(last_day(d) AS VARCHAR) AS month_end,
       CAST(d = last_day(d) AS BOOLEAN) AS is_month_end
FROM (
    SELECT UNNEST(generate_series(DATE '{_SPINE_LO}', DATE '{_SPINE_HI}',
                                  INTERVAL 1 DAY))::DATE AS d
)
"""


@register("date_dimension_spine", oracle=SPINE_SQL, covers=["F11", "F16", "P2"])
def q_date_dimension_spine(spark, sf_dir):
    """Generated calendar dimension (1995-1996): ISO weekday, weekend
    flag, month key, quarter, month-end markers — from sequence(), no
    scan. The dimension a reporting layer broadcasts everywhere."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_SPINE_LO).cast("date"),
                F.lit(_SPINE_HI).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    iso_dow = (F.weekday("d") + 1).cast("long")
    return spine.select(
        F.col("d").cast("string").alias("day"),
        iso_dow.alias("iso_dow"),
        iso_dow.isin(6, 7).alias("is_weekend"),
        F.date_format("d", "yyyyMM").cast("long").alias("month_key"),
        F.quarter("d").cast("long").alias("q"),
        F.last_day("d").cast("string").alias("month_end"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    )


_US_HOUR = 3_600_000_000

LOCF_SQL = f"""
WITH obs AS (
    SELECT user_id, epoch_us(ts) // {_US_HOUR} AS hour_idx,
           CAST(ROUND(MAX(value) * 100) AS BIGINT) AS v_cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, epoch_us(ts) // {_US_HOUR}
),
rng AS (
    SELECT user_id, MIN(hour_idx) AS lo, MAX(hour_idx) AS hi FROM obs GROUP BY user_id
),
grid AS (
    SELECT r.user_id, g.h AS hour_idx
    FROM rng r, LATERAL (SELECT UNNEST(generate_series(r.lo, r.hi)) AS h) g
),
joined AS (
    SELECT g.user_id, g.hour_idx, o.v_cents
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.hour_idx = g.hour_idx
)
SELECT user_id, CAST(hour_idx AS BIGINT) AS hour_idx,
       CAST(coalesce(v_cents, 0) AS BIGINT) AS observed_cents,
       CAST(last_value(v_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour_idx
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled_cents,
       v_cents IS NULL AS was_filled
FROM joined
"""


@register("locf_fill", oracle=LOCF_SQL, covers=["T1", "J2", "O1"])
def q_locf_fill(spark, sf_dir):
    """Hourly LOCF resample of each user's purchase values: grid =
    sequence(min_hour, max_hour) per user (narrow explode), one left
    join to the observations, one keyed last(ignorenulls) window for
    the fill. Values in exact cents; the first grid hour is always an
    observation, so the fill never sees a leading NULL."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp")) / _US_HOUR)
            .cast("long")
            .alias("hour_idx"),
            "value",
        )
        .groupBy("user_id", "hour_idx")
        .agg(F.expr("CAST(ROUND(MAX(value) * 100) AS BIGINT)").alias("v_cents"))
    )
    rng = obs.groupBy("user_id").agg(
        F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi")
    )
    grid = rng.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hour_idx")
    )
    joined = grid.join(obs, ["user_id", "hour_idx"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("hour_idx").cast("long").alias("hour_idx"),
        F.coalesce("v_cents", F.lit(0)).cast("long").alias("observed_cents"),
        F.last("v_cents", ignorenulls=True).over(w).cast("long").alias("filled_cents"),
        F.col("v_cents").isNull().alias("was_filled"),
    )


CLAMPED_SQL = """
WITH deltas AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CASE WHEN event_type = 'purchase'
                THEN CAST(ROUND(value * 100) AS BIGINT)
                ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta_cents
    FROM events WHERE event_type IN ('purchase', 'click')
),
folded AS (
    SELECT user_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list(delta_cents ORDER BY ts_us, event_id)),
               (acc, x) -> greatest(acc + x, CAST(0 AS BIGINT))
           ) AS final_cents,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(delta_cents) AS BIGINT) AS net_cents
    FROM deltas GROUP BY user_id
)
SELECT user_id, final_cents, n_moves, net_cents,
       final_cents - greatest(net_cents, 0) AS clamp_gain_cents
FROM folded
"""


@register("stock_balance_clamped", oracle=CLAMPED_SQL, covers=["A2", "O1", "K2"])
def q_stock_balance_clamped(spark, sf_dir):
    """Clamped running balance per user: purchases add cents, clicks
    withdraw them, and the balance floors at zero (lost demand, not
    debt) — final balance + the clamp gain vs the unclamped net. The
    left-to-right fold max(0, acc+delta) has no window-function form,
    so it runs in ``applyInPandas``: one shuffle on user_id, a
    vectorized numpy fold per group, scalar state. The DuckDB twin
    folds the identical ordered list with list_reduce — the two
    escape hatches must agree exactly."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    deltas = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
        )
        .otherwise(F.expr("-CAST(ROUND(value * 100) AS BIGINT)"))
        .alias("delta_cents"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        acc = 0
        for d in pdf["delta_cents"].to_numpy():
            acc = max(acc + int(d), 0)
        net = int(pdf["delta_cents"].sum())
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "final_cents": [acc],
                "n_moves": [len(pdf)],
                "net_cents": [net],
                "clamp_gain_cents": [acc - max(net, 0)],
            }
        )

    return deltas.groupBy("user_id").applyInPandas(
        fold,
        "user_id long, final_cents long, n_moves long, net_cents long,"
        " clamp_gain_cents long",
    )
