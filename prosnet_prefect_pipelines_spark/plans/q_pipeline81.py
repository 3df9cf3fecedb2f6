"""Pipeline batch 81 (north-star extension): OLAP drill-down &
temporal profiles — hierarchical share-of-parent rollups, repeat-
purchase brand transitions, weekend-effect analysis, new-vs-returning
revenue splits, and the day-of-week x hour heat profile.

Exactness discipline: all shares in truncating ppm over exact cents;
day-of-week mappings are spelled out per engine (Spark dayofweek is
1=Sunday, DuckDB dow is 0=Sunday — pinned to ISO 1=Monday..7=Sunday in
both)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# hierarchical share-of-parent rollup: region -> nation -> segment.

HIER_SQL = """
WITH leaf AS (
    SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
           c.c_mktsegment AS segment,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY region, nation, segment
),
nat AS (SELECT region, nation, SUM(cents) AS cents FROM leaf GROUP BY region, nation),
reg AS (SELECT region, SUM(cents) AS cents FROM nat GROUP BY region),
tot AS (SELECT SUM(cents) AS cents FROM reg)
SELECT l.region AS region, CAST(l.nation AS BIGINT) AS nation, l.segment,
       CAST(l.cents AS BIGINT) AS cents,
       CAST(CAST(l.cents AS HUGEINT) * 1000000 // n.cents AS BIGINT)
           AS share_of_nation_ppm,
       CAST(CAST(n.cents AS HUGEINT) * 1000000 // r.cents AS BIGINT)
           AS nation_share_of_region_ppm,
       CAST(CAST(r.cents AS HUGEINT) * 1000000 // t.cents AS BIGINT)
           AS region_share_of_total_ppm
FROM leaf l
JOIN nat n ON n.region = l.region AND n.nation = l.nation
JOIN reg r ON r.region = l.region
CROSS JOIN tot t
"""


@register("hierarchical_share_report", oracle=HIER_SQL, covers=["A2", "J1"])
def q_hierarchical_share_report(spark, sf_dir):
    """Hierarchical share-of-parent: every (region, nation, segment)
    leaf with its share of the nation, the nation's share of the
    region, and the region's share of the total — the drill-down
    percentages an OLAP tree view renders. One leaf rollup, two
    derived-parent rollups (all tiny) joined back broadcast."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey"), F.col("n_regionkey").alias("region")
    )
    leaf = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_nationkey"),
                    F.col("c_mktsegment").alias("segment"),
                )
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation["n_nationkey"],
        )
        .groupBy("region", F.col("c_nationkey").alias("nation"), "segment")
        .agg(F.sum("cents").alias("cents"))
    )
    nat = leaf.groupBy("region", "nation").agg(F.sum("cents").alias("ncents"))
    reg = nat.groupBy("region").agg(F.sum("ncents").alias("rcents"))
    tot = reg.agg(F.sum("rcents").alias("tcents"))
    return (
        leaf.join(F.broadcast(nat), ["region", "nation"])
        .join(F.broadcast(reg), "region")
        .join(F.broadcast(tot))
        .select(
            "region",
            F.col("nation").cast("long").alias("nation"),
            "segment",
            F.col("cents").cast("long").alias("cents"),
            F.expr(
                "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div ncents AS BIGINT)"
            ).alias("share_of_nation_ppm"),
            F.expr(
                "CAST(CAST(ncents AS DECIMAL(38,0)) * 1000000 div rcents AS BIGINT)"
            ).alias("nation_share_of_region_ppm"),
            F.expr(
                "CAST(CAST(rcents AS DECIMAL(38,0)) * 1000000 div tcents AS BIGINT)"
            ).alias("region_share_of_total_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# repeat-purchase brand transitions.

BRAND_TRANS_SQL = """
WITH top_brand AS (
    -- one brand per order: the brand with the largest cent total
    -- (brand name tie-break)
    SELECT l_orderkey, brand FROM (
        SELECT l.l_orderkey, p.p_brand AS brand,
               row_number() OVER (
                   PARTITION BY l.l_orderkey
                   ORDER BY SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                                DESC, p.p_brand
               ) AS rn
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY l.l_orderkey, p.p_brand
    ) t WHERE rn = 1
),
seq AS (
    SELECT o.o_custkey, tb.brand,
           lead(tb.brand) OVER (PARTITION BY o.o_custkey
                                ORDER BY o.o_orderdate, o.o_orderkey)
               AS next_brand
    FROM orders o JOIN top_brand tb ON tb.l_orderkey = o.o_orderkey
)
SELECT brand, next_brand, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CASE WHEN brand = next_brand THEN 1 ELSE 0 END AS INT) AS loyal
FROM seq WHERE next_brand IS NOT NULL
GROUP BY brand, next_brand
"""


@register("repeat_purchase_transitions", oracle=BRAND_TRANS_SQL, covers=["J1", "O6", "A2"])
def q_repeat_purchase_transitions(spark, sf_dir):
    """Repeat-purchase brand transitions: each order reduced to its
    dominant brand (largest cent total, name tie-break), then
    consecutive orders per customer paired by lead() — the
    brand-loyalty transition matrix (diagonal = loyal repeats). Part
    dim broadcast; the order sequence window partitions by customer."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_brand = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("l_orderkey", "brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("cents").desc(), F.col("brand")
    )
    top_brand = (
        per_brand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "brand")
    )
    ws = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.join(
        top_brand, orders["o_orderkey"] == top_brand["l_orderkey"]
    ).select(
        "o_custkey",
        "brand",
        "o_orderdate",
        "o_orderkey",
    ).withColumn("next_brand", F.lead("brand").over(ws))
    return (
        seq.filter(F.col("next_brand").isNotNull())
        .groupBy("brand", "next_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "loyal",
            F.when(F.col("brand") == F.col("next_brand"), 1)
            .otherwise(0)
            .cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# weekend effect.

WEEKEND_SQL = """
WITH o AS (
    SELECT CASE WHEN isodow(CAST(o_orderdate AS DATE)) >= 6 THEN 1 ELSE 0 END
               AS is_weekend,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (
    SELECT is_weekend, COUNT(*) AS n, SUM(cents) AS cents FROM o
    GROUP BY is_weekend
)
SELECT CAST(is_weekend AS INT) AS is_weekend,
       CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS BIGINT) AS cents,
       CAST(CAST(cents AS HUGEINT) // n AS BIGINT) AS mean_cents
FROM g
"""


@register("weekend_effect_report", oracle=WEEKEND_SQL, covers=["A2", "F16"])
def q_weekend_effect_report(spark, sf_dir):
    """Weekend-vs-weekday order profile: volume, revenue, and
    truncating mean order value split by ISO weekend — the seasonality
    split whose DAY-NUMBERING is the classic portability trap (Spark
    dayofweek: 1=Sunday; DuckDB isodow: 7=Sunday) — both sides mapped
    explicitly to ISO so the split agrees."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # Spark: dayofweek 1=Sunday..7=Saturday -> ISO dow = ((d + 5) % 7) + 1
    isodow = ((F.dayofweek(F.to_date("o_orderdate")) + 5) % 7) + 1
    o = orders.select(
        F.when(isodow >= 6, 1).otherwise(0).alias("is_weekend"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return o.groupBy("is_weekend").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
        F.expr(
            "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) div COUNT(1) AS BIGINT)"
        ).alias("mean_cents"),
    ).select(
        F.col("is_weekend").cast("int").alias("is_weekend"),
        "n_orders",
        "cents",
        "mean_cents",
    )


# ---------------------------------------------------------------------------
# new vs returning revenue per month.

NEWRET_SQL = """
WITH first_order AS (
    SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS d0 FROM orders
    GROUP BY o_custkey
),
o AS (
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           CASE WHEN date_trunc('month', o.o_orderdate)
                     = date_trunc('month', f.d0) THEN 'new' ELSE 'returning'
           END AS cohort,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
)
SELECT month, cohort,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM o GROUP BY month, cohort
"""


@register("new_vs_returning_report", oracle=NEWRET_SQL, covers=["A2", "J1"])
def q_new_vs_returning_report(spark, sf_dir):
    """New-vs-returning revenue split: an order is 'new' iff it falls
    in its customer's first-order month — the acquisition-vs-retention
    decomposition every growth report leads with. First-order dates are
    one keyed min-aggregation joined back on the customer key."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    first_order = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("d0")
    )
    o = orders.join(first_order, "o_custkey").select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.when(
            F.trunc("o_orderdate", "month") == F.trunc("d0", "month"), "new"
        )
        .otherwise("returning")
        .alias("cohort"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return o.groupBy("month", "cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# day-of-week x hour heat profile.

DOW_HOUR_SQL = """
WITH ev AS (
    SELECT isodow(CAST(ts AS DATE)) AS dow,
           EXTRACT(hour FROM ts) AS hour
    FROM events
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ev GROUP BY dow, hour
"""


@register("dow_hour_heatmap", oracle=DOW_HOUR_SQL, covers=["A2", "F16"])
def q_dow_hour_heatmap(spark, sf_dir):
    """Day-of-week x hour-of-day event heat map (ISO day numbering
    pinned on both engines) — the staffing/traffic profile behind every
    ops dashboard. One narrow extraction pass + a 7x24-keyed rollup."""
    ev = read_events(spark, sf_dir).select(
        F.timestamp_micros(F.col("ts_us")).alias("ts")
    )
    isodow = ((F.dayofweek(F.to_date("ts")) + 5) % 7) + 1
    return ev.select(
        isodow.cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
    ).groupBy("dow", "hour").agg(F.count(F.lit(1)).cast("long").alias("n"))
