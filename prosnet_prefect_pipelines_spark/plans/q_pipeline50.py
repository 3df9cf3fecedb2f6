"""Pipeline batch 50: network science + temporal dynamics —

- ``degree_assortativity``: the degree-assortativity coefficient
  (Newman 2002) of the orders graph — Pearson correlation of the
  endpoint degrees over every directed edge. Positive = hubs link to
  hubs. Follows the q_pipeline10 exact-sums convention: six DECIMAL
  accumulators, a FLOOR-scaled single IEEE sqrt/divide chain at the
  end (IEEE sqrt and divide are correctly rounded, so the surface is
  deterministic cross-engine).
- ``activity_burstiness``: per-user Fano factor of hourly event
  counts (variance / mean, over the user's active span) — burstiness
  > 1 means clumped activity, ~1 Poisson-like, < 1 regular. All
  moments exact integer sums; the final index is one scaled integer
  division (micro units). The temporal-dynamics screen for bot-like
  vs human-like accounts.

Scale notes: assortativity is degree table (one groupBy) + one edge
join + one global six-sum aggregation; burstiness is two keyed
aggregations (hourly counts -> per-user moments).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _GRAPH_SQL, _und_edges

ASSORT_SQL = (
    "WITH "
    + _GRAPH_SQL.strip()
    + """,
deg AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS d FROM und GROUP BY src),
dpairs AS (
    SELECT da.d AS x, db.d AS y
    FROM und e JOIN deg da ON da.node = e.src JOIN deg db ON db.node = e.dst
),
sums AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM dpairs
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       CAST(FLOOR(
           CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
           / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
           * 1000000) AS BIGINT) AS assortativity_micro
FROM sums
"""
)


@register("degree_assortativity", oracle=ASSORT_SQL, covers=["J1", "A2"])
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity: Pearson over (deg(src), deg(dst)) across
    all directed edges — exact DECIMAL sums, one FLOOR-scaled IEEE
    sqrt/divide chain (correctly-rounded ops, deterministic
    cross-engine). Degree table joins back on the node keys; the
    six-sum reduction is a single map-side-combined aggregate."""
    und = _und_edges(spark, sf_dir).localCheckpoint(eager=False)  # deg + join
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("y"))
    pairs = und.join(da, "src").join(db, "dst")
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    sums = pairs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.floor(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            )
            / F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("assortativity_micro"),
    )


_US_HOUR = 3_600_000_000

BURSTINESS_SQL = f"""
WITH hourly AS (
    SELECT user_id, epoch_us(ts) // {_US_HOUR} AS h,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY user_id, epoch_us(ts) // {_US_HOUR}
),
span AS (
    SELECT user_id,
           CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n_hours,
           CAST(SUM(c) AS BIGINT) AS s1,
           CAST(SUM(c * c) AS BIGINT) AS s2,
           CAST(COUNT(*) AS BIGINT) AS active_hours
    FROM hourly GROUP BY user_id
)
SELECT user_id, n_hours, active_hours, s1 AS n_events,
       -- fano_micro = 1e6 * var / mean over the FULL span (empty hours
       -- contribute zeros): var*n^2 = n*s2 - s1^2; mean*n = s1
       CAST(CAST(n_hours * s2 - s1 * s1 AS HUGEINT) * 1000000
            // (CAST(s1 AS HUGEINT) * n_hours) AS BIGINT) AS fano_micro
FROM span
"""


@register("activity_burstiness", oracle=BURSTINESS_SQL, covers=["A2", "T1"])
def q_activity_burstiness(spark, sf_dir):
    """Per-user burstiness (Fano factor) of hourly activity over the
    user's active span, empty hours included: fano = var/mean =
    (n*s2 - s1^2) / (s1 * n) — exact integer moments, one floor
    division into micro units. Two keyed aggregations; nothing
    materializes the empty grid (the zero hours enter through the
    closed form, not through rows)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.expr(f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) div {_US_HOUR} AS BIGINT)").alias("h"),
    )
    hourly = ev.groupBy("user_id", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    span = hourly.groupBy("user_id").agg(
        (F.max("h") - F.min("h") + 1).cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("active_hours"),
    )
    return span.select(
        "user_id",
        "n_hours",
        "active_hours",
        F.col("s1").alias("n_events"),
        F.expr(
            "CAST(CAST(n_hours * s2 - s1 * s1 AS DECIMAL(38,0)) * 1000000"
            " div (CAST(s1 AS DECIMAL(38,0)) * n_hours) AS BIGINT)"
        ).alias("fano_micro"),
    )
