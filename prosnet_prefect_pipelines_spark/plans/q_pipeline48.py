"""Pipeline batch 48: release engineering + causal reporting —

- ``wap_publish_gate``: the Write-Audit-Publish pattern as one query:
  a curated slice of the orders feed is STAGED (written to a staging
  parquet path), the staged files — not the source — are re-read and
  AUDITED against the contract rules (not-null, uniqueness, range,
  domain, volume floor), and the gate emits one row per rule plus the
  final go/no-go verdict row the publish step keys on. Staging +
  re-read makes the audit see exactly what a consumer would (e.g.
  schema/precision changes introduced by the writer itself), which is
  the point of WAP over validate-then-write.
- ``diff_in_diff_report``: difference-in-differences over the event
  stream: treatment = odd users, the intervention cut at the corpus
  median week; per (group, period) exact purchase-rate ppm
  (purchases / events), the two first differences and the DiD
  estimate, all integer arithmetic.

Scale notes: the gate stages once (one write), audits with
map-side-combined conditional aggregates + one keyed uniqueness
shuffle; the DiD is a single 4-cell aggregation — two narrow passes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

_MIN_ROWS = 100

WAP_SQL = f"""
WITH staged AS (
    SELECT * FROM orders WHERE o_orderdate >= DATE '1995-01-01'
),
uniqd AS (
    SELECT coalesce(SUM(c - 1), 0) AS v FROM (
        SELECT o_orderkey, COUNT(*) AS c FROM staged GROUP BY o_orderkey
    ) WHERE c > 1
),
rules AS (
    SELECT 'rows_min' AS rule,
           CAST(CASE WHEN (SELECT COUNT(*) FROM staged) >= {_MIN_ROWS}
                THEN 0 ELSE 1 END AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'o_orderkey_not_null',
           CAST((SELECT COUNT(*) FROM staged WHERE o_orderkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'o_orderkey_unique', CAST((SELECT v FROM uniqd) AS BIGINT)
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST((SELECT COUNT(*) FROM staged WHERE o_totalprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'o_orderstatus_domain',
           CAST((SELECT COUNT(*) FROM staged
                 WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
)
SELECT rule, n_violations FROM rules
UNION ALL
SELECT 'PUBLISH_GO',
       CAST(CASE WHEN (SELECT SUM(n_violations) FROM rules) = 0
            THEN 0 ELSE 1 END AS BIGINT)
"""


@register("wap_publish_gate", oracle=WAP_SQL, covers=["K3", "A2", "P7"])
def q_wap_publish_gate(spark, sf_dir):
    """Write-Audit-Publish gate: stage the curated slice to parquet,
    re-read THE STAGED FILES, audit five contract rules over them, and
    emit per-rule violations plus the PUBLISH_GO verdict (0 = publish).
    The audit runs on the writer's own output — the WAP guarantee; the
    oracle audits the same slice logically (DuckDB cannot see the
    staging dir, and the writer is lossless for this schema, which the
    hash match itself verifies)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    staged_src = orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01"))
    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    stage_dir = private_stage_dir(
        "wap_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    )
    staged_src.write.mode("overwrite").parquet(stage_dir)
    staged = spark.read.parquet(stage_dir)

    def rule(name, df):
        return df.select(F.lit(name).alias("rule"), F.col("v").cast("long").alias("n_violations"))

    rows_min = rule(
        "rows_min",
        staged.agg(
            F.when(F.count(F.lit(1)) >= _MIN_ROWS, F.lit(0)).otherwise(F.lit(1)).alias("v")
        ),
    )
    nn = rule(
        "o_orderkey_not_null",
        staged.agg(F.sum(F.col("o_orderkey").isNull().cast("long")).alias("v")),
    )
    uniq = rule(
        "o_orderkey_unique",
        staged.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v")),
    )
    pos = rule(
        "o_totalprice_positive",
        staged.agg(F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v")),
    )
    dom = rule(
        "o_orderstatus_domain",
        staged.agg(
            F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")).alias("v")
        ),
    )
    rules = rows_min.unionAll(nn).unionAll(uniq).unionAll(pos).unionAll(dom)
    rules = rules.localCheckpoint(eager=False)  # verdict re-reads it
    verdict = rules.agg(
        F.when(F.sum("n_violations") == 0, F.lit(0)).otherwise(F.lit(1)).alias("v")
    ).select(F.lit("PUBLISH_GO").alias("rule"), F.col("v").cast("long").alias("n_violations"))
    return rules.unionAll(verdict)


_US_WEEK = 7 * 24 * 3_600_000_000

DID_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) // {_US_WEEK} AS week FROM events
),
cut AS (
    SELECT CAST((MIN(week) + MAX(week)) // 2 AS BIGINT) AS w FROM ev
),
cells AS (
    SELECT (user_id % 2 = 1) AS treated, (week >= cut.w) AS post,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purch
    FROM ev, cut GROUP BY 1, 2
),
rates AS (
    SELECT treated, post,
           n_events, n_purch,
           CAST(CAST(n_purch AS HUGEINT) * 1000000 // n_events AS BIGINT) AS rate_ppm
    FROM cells
)
SELECT r.treated, r.post, r.n_events, r.n_purch, r.rate_ppm,
       CAST((SELECT (tp.rate_ppm - tpre.rate_ppm) - (cp.rate_ppm - cpre.rate_ppm)
             FROM rates tp, rates tpre, rates cp, rates cpre
             WHERE tp.treated AND tp.post AND tpre.treated AND NOT tpre.post
               AND NOT cp.treated AND cp.post AND NOT cpre.treated
               AND NOT cpre.post) AS BIGINT) AS did_ppm
FROM rates r
"""


@register("diff_in_diff_report", oracle=DID_SQL, covers=["A2", "J1"])
def q_diff_in_diff_report(spark, sf_dir):
    """Difference-in-differences: treatment = odd users, intervention
    at the median week; per-cell purchase-rate ppm (exact), the DiD
    estimate attached to every cell row. One 4-cell aggregation + a
    broadcast of the 4-row rate table into the final projection."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.expr(f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) div {_US_WEEK} AS BIGINT)").alias(
            "week"
        ),
    )
    cut = ev.agg(
        F.expr("CAST((MIN(week) + MAX(week)) div 2 AS BIGINT)").alias("w")
    )
    cells = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy(
            (F.col("user_id") % 2 == 1).alias("treated"),
            (F.col("week") >= F.col("w")).alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("n_purch"),
        )
    )
    rates = cells.select(
        "treated",
        "post",
        "n_events",
        "n_purch",
        F.expr(
            "CAST(CAST(n_purch AS DECIMAL(38,0)) * 1000000 div n_events AS BIGINT)"
        ).alias("rate_ppm"),
    ).localCheckpoint(eager=False)  # self-joined for the estimate

    def cell(tr, po, alias):
        return rates.filter(
            (F.col("treated") == tr) & (F.col("post") == po)
        ).select(F.col("rate_ppm").alias(alias))

    did = (
        cell(True, True, "tp")
        .crossJoin(cell(True, False, "tpre"))
        .crossJoin(cell(False, True, "cp"))
        .crossJoin(cell(False, False, "cpre"))
        .select(
            ((F.col("tp") - F.col("tpre")) - (F.col("cp") - F.col("cpre")))
            .cast("long")
            .alias("did_ppm")
        )
    )
    return rates.crossJoin(F.broadcast(did))
