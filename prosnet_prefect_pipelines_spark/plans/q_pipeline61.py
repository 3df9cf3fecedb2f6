"""Pipeline batch 61: exact weighted median per group —

- ``weighted_median_groups``: per event_type, the exact lower
  weighted median of ``value`` with weight = payload size
  (len(props)) — the robust per-group statistic that survives skewed
  payloads where a plain median over rows doesn't. Selection by
  running-weight threshold (first row where 2*cumw >= W) over a
  deterministic (value, event_id) order, so the answer is unique and
  engine-independent; weights stay integer throughout.

Scale notes: one per-group window cumsum (per-key sort — the unit of
parallelism) plus a broadcast-sized per-group total join; no global
sort, no quadratic term.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

WMEDIAN_SQL = """
WITH w AS (
    SELECT event_type, event_id, value,
           CAST(len(COALESCE(props, '')) + 1 AS BIGINT) AS wt
    FROM events WHERE value IS NOT NULL
),
cum AS (
    SELECT event_type, event_id, value, wt,
           CAST(SUM(wt) OVER (PARTITION BY event_type
                              ORDER BY value, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
    FROM w
),
tot AS (SELECT event_type, CAST(SUM(wt) AS BIGINT) AS total_w FROM w GROUP BY event_type),
hit AS (
    SELECT c.event_type, c.value, c.cumw, t.total_w,
           row_number() OVER (PARTITION BY c.event_type
                              ORDER BY c.cumw, c.event_id) AS rn
    FROM cum c JOIN tot t ON t.event_type = c.event_type
    WHERE 2 * c.cumw >= t.total_w
)
SELECT event_type, round(value, 6) AS weighted_median, total_w
FROM hit WHERE rn = 1
"""


@register("weighted_median_groups", oracle=WMEDIAN_SQL, covers=["A2", "O1", "O6"])
def q_weighted_median_groups(spark, sf_dir):
    """Exact lower weighted median of value per event_type, weighted by
    payload size. Per-key window cumsum + threshold pick — determinism
    from the (value, event_id) order and integer weights."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    w = events.select(
        "event_type",
        "event_id",
        "value",
        (F.length(F.coalesce(F.col("props"), F.lit(""))) + 1)
        .cast("long")
        .alias("wt"),
    )
    cw = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w.withColumn("cumw", F.sum("wt").over(cw).cast("long"))
    tot = w.groupBy("event_type").agg(F.sum("wt").cast("long").alias("total_w"))
    hit = (
        cum.join(F.broadcast(tot), "event_type")
        .filter(2 * F.col("cumw") >= F.col("total_w"))
    )
    pick = Window.partitionBy("event_type").orderBy("cumw", "event_id")
    return (
        hit.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.round("value", 6).alias("weighted_median"),
            "total_w",
        )
    )
