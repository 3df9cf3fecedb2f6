"""Pipeline batch 47: RFM customer segmentation — the classic
marketing-analytics rollup the engine had not yet covered end to end:
per user, Recency (hours since last purchase, against the corpus
max-time anchor), Frequency (purchase count) and Monetary (exact cents
total), each quintile-scored 1-5 with deterministic threshold cuts,
composed into the canonical 'R-F-M' segment label plus the standard
coarse segment names (champion / loyal / at-risk / hibernating).

Scoring uses the SAME distinct-value threshold machinery as the CCNet
tertiles (batch 27): quintile cuts come from a cumulative window over
DISTINCT metric values — never a global row sort — and ties share a
score on both engines by construction. Recency quintiles are inverted
(most recent = 5).

Scale: three per-user aggregates (one shuffle on user_id), three
distinct-value threshold tables (tiny, broadcast back), one label
projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

_US_HOUR = 3_600_000_000


def _quintile_sql(metric_table: str, col: str, invert: bool) -> str:
    """Threshold-based quintile score from distinct values of ``col``.

    Score k (1..5) covers the k-th fifth of the user population ordered
    by the metric; ascending order scores low values 1 (or 5 when
    ``invert``)."""
    direction = "DESC" if invert else "ASC"
    # score = (cum-1)*5 // n + 1: pure integer quintile index over the
    # population ordered by the metric; ties share their distinct
    # value's cumulative count, hence the same score on both engines
    return f"""
    SELECT u.user_id,
           CAST((c.cum - 1) * 5 // c.n + 1 AS BIGINT) AS score
    FROM {metric_table} u
    JOIN (
        SELECT {col},
               SUM(cnt) OVER (ORDER BY {col} {direction}
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS n
        FROM (SELECT {col}, COUNT(*) AS cnt FROM {metric_table} GROUP BY {col})
    ) c USING ({col})
    """


RFM_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
anchor AS (SELECT MAX(ts_us) AS t FROM ev),
rfm AS (
    SELECT e.user_id,
           CAST((a.t - MAX(e.ts_us)) // {_US_HOUR} AS BIGINT) AS recency_h,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(e.cents) AS BIGINT) AS monetary_cents
    FROM ev e, anchor a GROUP BY e.user_id, a.t
),
rs AS ({_quintile_sql('rfm', 'recency_h', True)}),
fs AS ({_quintile_sql('rfm', 'frequency', False)}),
ms AS ({_quintile_sql('rfm', 'monetary_cents', False)})
SELECT rfm.user_id, rfm.recency_h, rfm.frequency, rfm.monetary_cents,
       rs.score AS r, fs.score AS f, ms.score AS m,
       CAST(rs.score AS VARCHAR) || '-' || CAST(fs.score AS VARCHAR)
           || '-' || CAST(ms.score AS VARCHAR) AS rfm_label,
       CASE WHEN rs.score >= 4 AND fs.score >= 4 THEN 'champion'
            WHEN fs.score >= 4 THEN 'loyal'
            WHEN rs.score <= 2 AND ms.score >= 4 THEN 'at_risk'
            WHEN rs.score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
FROM rfm
JOIN rs ON rs.user_id = rfm.user_id
JOIN fs ON fs.user_id = rfm.user_id
JOIN ms ON ms.user_id = rfm.user_id
"""


def _quintile_scores(rfm, col: str, invert: bool):
    """Quintile score per user from the distinct-value cumulation —
    r11: the cumulation now runs through the distributed two-pass
    prefix sum (``operators/distrank.py``). The distinct-METRIC table
    is much smaller than the user table but still value-cardinality
    (distinct cents grow with the corpus), so the old single-partition
    window and the forced broadcast of the score table were both
    latent scale cliffs; the rewrite is bit-identical (exact long
    cumulation, n folded in as a literal) and leaves the score join to
    AQE (broadcast while small, shuffle at scale)."""
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_sums,
    )

    direction = F.col(col).desc() if invert else F.col(col).asc()
    dist = rfm.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    cum = prefix_sums(dist, [direction], {"cum": F.col("cnt")}, rn_out="_vrn")
    # n (the population total) as a broadcast 1-row dim — same integer
    # quintile arithmetic as the old driver-side literal, job-free at
    # construction (r12)
    tot = cum.agg(F.sum("cnt").cast("long").alias("_qn"))
    score = F.expr("CAST((cum - 1) * 5 div _qn + 1 AS BIGINT)")
    return rfm.select("user_id", col).join(
        cum.crossJoin(F.broadcast(tot)).select(col, score.alias("score")),
        col,
    ).select("user_id", "score")


@register("rfm_segmentation", oracle=RFM_SQL, covers=["A2", "O1", "J1"])
def q_rfm_segmentation(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary (exact
    hours/counts/cents) quintile-scored by the distinct-value threshold
    pattern (cumulative window over DISTINCT metric values — metric
    cardinality, not user cardinality; the single-partition windows run
    over those small distinct tables only, documented like
    vocab_coverage) and composed into R-F-M labels + coarse segments.
    One user-keyed aggregate, three broadcast threshold joins."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    anchor = ev.agg(F.max("ts_us").alias("t"))
    rfm = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "t")
        .agg(
            F.expr(f"CAST((t - MAX(ts_us)) div {_US_HOUR} AS BIGINT)").alias(
                "recency_h"
            ),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .drop("t")
        .localCheckpoint(eager=False)  # three score joins reuse it
    )
    rs = _quintile_scores(rfm, "recency_h", True).withColumnRenamed("score", "r")
    fs = _quintile_scores(rfm, "frequency", False).withColumnRenamed("score", "f")
    ms = _quintile_scores(rfm, "monetary_cents", False).withColumnRenamed("score", "m")
    out = rfm.join(rs, "user_id").join(fs, "user_id").join(ms, "user_id")
    return out.select(
        "user_id",
        "recency_h",
        "frequency",
        "monetary_cents",
        "r",
        "f",
        "m",
        F.concat_ws("-", "r", "f", "m").alias("rfm_label"),
        F.when((F.col("r") >= 4) & (F.col("f") >= 4), F.lit("champion"))
        .when(F.col("f") >= 4, F.lit("loyal"))
        .when((F.col("r") <= 2) & (F.col("m") >= 4), F.lit("at_risk"))
        .when(F.col("r") <= 2, F.lit("hibernating"))
        .otherwise(F.lit("regular"))
        .alias("segment"),
    )
