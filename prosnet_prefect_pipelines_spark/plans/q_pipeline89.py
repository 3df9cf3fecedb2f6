"""Pipeline batch 89 (north-star extension): operational analytics —
campaign lift, field-level change matrices, time-weighted balances,
sample-ratio-mismatch checks, and two-factor interaction means.

Exactness discipline: lifts/shares in truncating ppm; the SRM statistic
is the cross-multiplied chi-square numerator; time-weighted balances
integrate exact cent-microsecond products."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# campaign lift.

LIFT_SQL = """
WITH ev AS (
    SELECT CASE WHEN EXTRACT(day FROM ts) % 7 = 0 THEN 1 ELSE 0 END
               AS campaign_day,
           CAST(ts AS DATE) AS day,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
    FROM events
),
g AS (
    SELECT campaign_day,
           COUNT(DISTINCT day) AS n_days,
           COUNT(*) AS n_events,
           SUM(is_purchase) AS n_purchases
    FROM ev GROUP BY campaign_day
)
SELECT CAST(campaign_day AS INT) AS campaign_day,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(CAST(n_events AS HUGEINT) * 1000000 // n_days AS BIGINT)
           AS events_per_day_micro,
       CAST(CAST(n_purchases AS HUGEINT) * 1000000 // n_events AS BIGINT)
           AS purchase_rate_ppm
FROM g
"""


@register("campaign_lift_report", oracle=LIFT_SQL, covers=["A1", "A2"])
def q_campaign_lift_report(spark, sf_dir):
    """Campaign-day lift: traffic and purchase rate on campaign days
    (every 7th calendar day — the deterministic stand-in for a promo
    calendar dim) versus baseline days, normalized per day — the
    before/after table a marketing readout divides. One narrow pass +
    a two-row rollup."""
    ev = read_events(spark, sf_dir).select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_type"
    )
    src = ev.select(
        F.when(F.dayofmonth("ts") % 7 == 0, 1).otherwise(0).alias("campaign_day"),
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_purchase"
        ),
    )
    g = src.groupBy("campaign_day").agg(
        F.countDistinct("day").alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_purchase").alias("n_purchases"),
    )
    return g.select(
        F.col("campaign_day").cast("int").alias("campaign_day"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
        F.expr(
            "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000 div n_days AS BIGINT)"
        ).alias("events_per_day_micro"),
        F.expr(
            "CAST(CAST(n_purchases AS DECIMAL(38,0)) * 1000000 div n_events "
            "AS BIGINT)"
        ).alias("purchase_rate_ppm"),
    )


# ---------------------------------------------------------------------------
# field-level change matrix between two snapshot versions.

FIELD_CHANGE_SQL = """
WITH v1 AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderpriority
    FROM orders
),
v2 AS (
    -- patched snapshot: every 7th order +10 dollars; every 11th order
    -- re-prioritized
    SELECT o_orderkey,
           o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 7 = 0 THEN 1000 ELSE 0 END AS cents,
           CASE WHEN o_orderkey % 11 = 0 THEN '1-URGENT' ELSE o_orderpriority
           END AS o_orderpriority
    FROM orders
),
diff AS (
    SELECT CASE WHEN a.cents <> b.cents THEN 1 ELSE 0 END AS price_changed,
           CASE WHEN a.o_orderpriority <> b.o_orderpriority THEN 1 ELSE 0 END
               AS priority_changed
    FROM v1 a JOIN v2 b USING (o_orderkey)
)
SELECT CAST(price_changed AS INT) AS price_changed,
       CAST(priority_changed AS INT) AS priority_changed,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM diff GROUP BY price_changed, priority_changed
"""


@register("field_change_matrix", oracle=FIELD_CHANGE_SQL, covers=["J1", "A2"])
def q_field_change_matrix(spark, sf_dir):
    """Field-level snapshot diff: two versions of the orders table
    compared column by column, rows counted per changed-field
    combination — the data-diff matrix that tells a reviewer WHAT
    changed (prices, priorities, both, neither), not just how many
    rows. One keyed join + a 4-cell rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = o.select("o_orderkey", cents.alias("cents"), "o_orderpriority")
    v2 = o.select(
        "o_orderkey",
        (
            cents + F.when(F.col("o_orderkey") % 7 == 0, 1000).otherwise(0)
        ).alias("cents2"),
        F.when(F.col("o_orderkey") % 11 == 0, "1-URGENT")
        .otherwise(F.col("o_orderpriority"))
        .alias("pri2"),
    )
    diff = v1.join(v2, "o_orderkey").select(
        F.when(F.col("cents") != F.col("cents2"), 1).otherwise(0).alias(
            "price_changed"
        ),
        F.when(F.col("o_orderpriority") != F.col("pri2"), 1)
        .otherwise(0)
        .alias("priority_changed"),
    )
    return diff.groupBy("price_changed", "priority_changed").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).select(
        F.col("price_changed").cast("int").alias("price_changed"),
        F.col("priority_changed").cast("int").alias("priority_changed"),
        "n_orders",
    )


# ---------------------------------------------------------------------------
# time-weighted average balance.

TWAB_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(round(value * 100) AS BIGINT) AS delta_cents
    FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
),
bal AS (
    SELECT user_id, ts_us,
           SUM(delta_cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS balance,
           lead(ts_us) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS next_ts
    FROM ev
),
seg AS (
    SELECT user_id, balance, next_ts - ts_us AS dur_us FROM bal
    WHERE next_ts IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       CAST(SUM(CAST(balance AS HUGEINT) * dur_us) // SUM(dur_us) AS BIGINT)
           AS twab_cents
FROM seg GROUP BY user_id
"""


@register("time_weighted_balance", oracle=TWAB_SQL, covers=["A2", "O1"])
def q_time_weighted_balance(spark, sf_dir):
    """Time-weighted average balance (TWAB): each purchase bumps the
    user's running balance; the average weights every balance level by
    EXACTLY how long it was held (the step-function integral banks and
    DeFi protocols compute interest from) — sum(balance x duration)
    div total duration, exact cent-microsecond integers. One user-keyed
    window deriving both the running balance and each level's
    duration."""
    ev = read_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        "ts_us",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("delta_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    bal = ev.select(
        "user_id",
        "ts_us",
        F.sum("delta_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("balance"),
        F.lead("ts_us").over(w).alias("next_ts"),
    )
    seg = bal.filter(F.col("next_ts").isNotNull()).select(
        "user_id",
        "balance",
        (F.col("next_ts") - F.col("ts_us")).alias("dur_us"),
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("dur_us").cast("long").alias("span_us"),
        F.expr(
            "CAST(SUM(CAST(balance AS DECIMAL(38,0)) * dur_us) div SUM(dur_us)"
            " AS BIGINT)"
        ).alias("twab_cents"),
    )


# ---------------------------------------------------------------------------
# sample-ratio-mismatch check.

SRM_SQL = """
WITH u AS (
    SELECT DISTINCT user_id, CAST(user_id % 2 AS INT) AS variant
    FROM events WHERE user_id IS NOT NULL
),
g AS (
    SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
           SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
    FROM u
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST(CAST((n0 - n1) * (n0 - n1) AS HUGEINT) * 1000000 // (n0 + n1)
            AS BIGINT) AS srm_chi2_micro,
       CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS HUGEINT) * 1000000
                      // (n0 + n1) > 3841459 THEN 1 ELSE 0 END AS INT)
           AS srm_flag
FROM g
"""


@register("srm_check", oracle=SRM_SQL, covers=["A2"])
def q_srm_check(spark, sf_dir):
    """Sample-ratio mismatch (SRM) check: for a 50/50 split, the
    chi-square statistic reduces to (n0-n1)²/(n0+n1) — computed in
    micro-scaled integers and flagged against the 3.841459 (p=0.05,
    df=1) critical value. The guardrail every experimentation platform
    runs BEFORE trusting any A/B readout (an unbalanced split means the
    assignment, not the treatment, is driving results)."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    u = ev.select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    return g.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.expr(
            "CAST(CAST((n0 - n1) * (n0 - n1) AS DECIMAL(38,0)) * 1000000 "
            "div (n0 + n1) AS BIGINT)"
        ).alias("srm_chi2_micro"),
        F.expr(
            "CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DECIMAL(38,0)) "
            "* 1000000 div (n0 + n1) > 3841459 THEN 1 ELSE 0 END AS INT)"
        ).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# two-factor interaction means.

INTERACTION_SQL = """
WITH pts AS (
    SELECT CAST(round(l_discount * 100) AS BIGINT) // 5 AS disc_band,
           CAST(round(l_extendedprice * 100) AS BIGINT) // 2000000 AS price_band,
           CAST(round(l_quantity) AS BIGINT) AS q
    FROM lineitem
)
SELECT CAST(disc_band AS BIGINT) AS disc_band,
       CAST(price_band AS BIGINT) AS price_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(q) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
           AS mean_qty_micro
FROM pts GROUP BY disc_band, price_band
"""


@register("interaction_means_2way", oracle=INTERACTION_SQL, covers=["A2"])
def q_interaction_means_2way(spark, sf_dir):
    """Two-factor interaction table: mean quantity per (discount band x
    price band) cell — the 2-way ANOVA-style means grid that reveals
    whether discount response DEPENDS on price tier (the interaction a
    marginal curve hides). One narrow binning pass + one grouped
    rollup, truncating micro means."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.select(
        F.expr("CAST(round(l_discount * 100) AS BIGINT) div 5").alias(
            "disc_band"
        ),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT) div 2000000"
        ).alias("price_band"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
    )
    return pts.groupBy("disc_band", "price_band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(CAST(SUM(q) AS DECIMAL(38,0)) * 1000000 div COUNT(1) "
            "AS BIGINT)"
        ).alias("mean_qty_micro"),
    )
