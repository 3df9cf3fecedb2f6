"""Pipeline batch 16 (north-star extension): chi-squared independence
test, Apriori size-3 itemsets, planar grid geo-join, and day-of-week
seasonal baselines — each hash-matched against a DuckDB twin.

Determinism: chi-squared is computed from integer counts with one
rounded division per cell; geo distances use the planar (equirectangular
small-area) approximation — pure arithmetic, no trig, so engines agree
bitwise; seasonal residuals are integer-scaled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- chi-squared independence test -------------------------------------------------------

CHI2_SQL = """
WITH obs AS (
    SELECT event_type, user_id % 2 AS cohort, CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY event_type, user_id % 2
),
margins AS (
    SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_total FROM obs GROUP BY event_type
),
cols AS (
    SELECT cohort, CAST(SUM(o) AS BIGINT) AS col_total FROM obs GROUP BY cohort
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
    SELECT obs.event_type, obs.cohort, obs.o,
           round(CAST(row_total AS DOUBLE) * col_total / n, 6) AS expected
    FROM obs JOIN margins USING (event_type) JOIN cols USING (cohort) CROSS JOIN tot
)
SELECT event_type, cohort, o, expected,
       round((o - expected) * (o - expected) / expected, 6) AS chi2_term
FROM cells
"""


@register("ab_test_chi2", oracle=CHI2_SQL, covers=["A2", "J1"])
def q_ab_test_chi2(spark, sf_dir):
    """Chi-squared independence cells for an A/B readout (event mix vs
    cohort): observed counts, expected under independence, and each
    cell's chi2 contribution — the experiment-analysis primitive.
    Contingency margins are two tiny grouped sums broadcast back onto
    the cells; the only data-sized shuffle is the initial count."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    obs = ev.groupBy("event_type", (F.col("user_id") % 2).alias("cohort")).agg(
        F.count(F.lit(1)).alias("o")
    )
    margins = obs.groupBy("event_type").agg(F.sum("o").alias("row_total"))
    cols = obs.groupBy("cohort").agg(F.sum("o").alias("col_total"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(margins), on="event_type")
        .join(F.broadcast(cols), on="cohort")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "expected",
            F.round(
                F.col("row_total").cast("double") * F.col("col_total") / F.col("n"), 6
            ),
        )
    )
    return cells.select(
        "event_type",
        "cohort",
        "o",
        "expected",
        F.round(
            (F.col("o") - F.col("expected")) * (F.col("o") - F.col("expected"))
            / F.col("expected"),
            6,
        ).alias("chi2_term"),
    )


# --- Apriori size-3 itemsets -------------------------------------------------------------

BASKET3_SQL = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey % 30 AS item FROM lineitem
),
triples AS (
    SELECT x.item AS i1, y.item AS i2, z.item AS i3, CAST(COUNT(*) AS BIGINT) AS support
    FROM items x
    JOIN items y ON x.l_orderkey = y.l_orderkey AND x.item < y.item
    JOIN items z ON y.l_orderkey = z.l_orderkey AND y.item < z.item
    GROUP BY x.item, y.item, z.item
)
SELECT i1, i2, i3, support FROM triples
ORDER BY support DESC, i1, i2, i3
LIMIT 20
"""


@register("basket_triples", oracle=BASKET3_SQL, covers=["J1", "A2", "O1"])
def q_basket_triples(spark, sf_dir):
    """Apriori step 3: top-20 size-3 itemsets by support. Candidate
    growth stays inside the basket (per-basket cubic over SMALL
    baskets), joins key on the basket id, support counts shuffle on the
    itemset — the classic frequent-itemset plan with no global
    enumeration. orderBy+limit = per-partition heaps."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select("l_orderkey", (F.col("l_partkey") % 30).alias("item")).distinct()
    x, y, z = items.alias("x"), items.alias("y"), items.alias("z")
    triples = (
        x.join(y, on="l_orderkey")
        .filter(F.col("x.item") < F.col("y.item"))
        .join(z, on="l_orderkey")
        .filter(F.col("y.item") < F.col("z.item"))
        .groupBy(
            F.col("x.item").alias("i1"),
            F.col("y.item").alias("i2"),
            F.col("z.item").alias("i3"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return triples.orderBy(F.col("support").desc(), "i1", "i2", "i3").limit(20)


# --- planar grid geo-join ----------------------------------------------------------------

# synthetic but deterministic coordinates on a ~[0,10]x[0,10] degree patch
_GEO_SQL_BASE = """
sup_pts AS (
    SELECT s_suppkey AS sid,
           CAST((s_suppkey % 1000) AS DOUBLE) / 100 AS sx,
           CAST(((s_suppkey * 7) % 1000) AS DOUBLE) / 100 AS sy
    FROM supplier
),
cust_pts AS (
    SELECT c_custkey AS cid,
           CAST((c_custkey % 1000) AS DOUBLE) / 100 AS cx,
           CAST(((c_custkey * 3) % 1000) AS DOUBLE) / 100 AS cy
    FROM customer WHERE c_custkey % 5 = 0
)
"""

GEO_JOIN_SQL = f"""
WITH {_GEO_SQL_BASE.strip()},
grid AS (
    SELECT sid, sx, sy,
           CAST(floor(sx / 0.5) AS BIGINT) + dx AS gx,
           CAST(floor(sy / 0.5) AS BIGINT) + dy AS gy
    FROM sup_pts,
         (SELECT unnest([-1, 0, 1]) AS dx) t1,
         (SELECT unnest([-1, 0, 1]) AS dy) t2
),
cand AS (
    SELECT c.cid, g.sid, c.cx, c.cy, g.sx, g.sy
    FROM cust_pts c
    JOIN grid g ON CAST(floor(c.cx / 0.5) AS BIGINT) = g.gx
               AND CAST(floor(c.cy / 0.5) AS BIGINT) = g.gy
)
SELECT cid, sid,
       round((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy), 6) AS d2
FROM cand
WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 0.25
"""


@register("geo_grid_join", oracle=GEO_JOIN_SQL, covers=["J1"])
def q_geo_grid_join(spark, sf_dir):
    """Spatial near-join (customers to suppliers within 0.5 degrees,
    planar small-area approximation — pure arithmetic, no trig) via the
    grid-bucket pattern: one side replicates into its 3x3 neighbor
    cells, the other joins its OWN cell only — every true near-pair
    shares a cell, candidates are bounded by cell co-residency, and the
    exact distance filter runs on candidates alone. The geohash-join
    plan, without the geohash."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup_pts = sup.select(
        F.col("s_suppkey").alias("sid"),
        ((F.col("s_suppkey") % 1000).cast("double") / 100).alias("sx"),
        (((F.col("s_suppkey") * 7) % 1000).cast("double") / 100).alias("sy"),
    )
    cust_pts = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("cid"),
        ((F.col("c_custkey") % 1000).cast("double") / 100).alias("cx"),
        (((F.col("c_custkey") * 3) % 1000).cast("double") / 100).alias("cy"),
    )
    neigh = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    grid = (
        sup_pts.withColumn("dx", neigh)
        .withColumn("dy", neigh)
        .select(
            "sid",
            "sx",
            "sy",
            (F.floor(F.col("sx") / 0.5).cast("long") + F.col("dx")).alias("gx"),
            (F.floor(F.col("sy") / 0.5).cast("long") + F.col("dy")).alias("gy"),
        )
    )
    cand = cust_pts.withColumn(
        "gx", F.floor(F.col("cx") / 0.5).cast("long")
    ).withColumn("gy", F.floor(F.col("cy") / 0.5).cast("long")).join(
        grid, on=["gx", "gy"]
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    return cand.filter(d2 <= 0.25).select(
        "cid", "sid", F.round(d2, 6).alias("d2")
    )


# --- day-of-week seasonal baseline -------------------------------------------------------

SEASONAL_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, CAST(ts AS DATE) - DATE '1970-01-01'
),
dow AS (SELECT event_type, day, n, day % 7 AS weekday FROM daily),
baseline AS (
    SELECT event_type, weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(n) AS BIGINT) AS total
    FROM dow GROUP BY event_type, weekday
)
SELECT d.event_type, d.day, d.weekday, d.n,
       CAST(d.n * b.n_days - b.total AS BIGINT) AS residual_scaled,
       b.n_days
FROM dow d JOIN baseline b ON d.event_type = b.event_type AND d.weekday = b.weekday
"""


@register("seasonal_residuals", oracle=SEASONAL_SQL, covers=["A2", "J1"])
def q_seasonal_residuals(spark, sf_dir):
    """Day-of-week seasonal baseline + integer-scaled residuals
    (n*D - total = D*(n - weekday_mean)): the deseasonalized series a
    volume monitor thresholds on, with the mean subtraction kept
    integral (same scaling trick as cusum_drift). Baselines are
    weekday-keyed aggregates broadcast back onto the series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    dow = daily.withColumn("weekday", F.col("day") % 7)
    baseline = dow.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("total")
    )
    return (
        dow.join(F.broadcast(baseline), on=["event_type", "weekday"])
        .select(
            "event_type",
            "day",
            "weekday",
            "n",
            (F.col("n") * F.col("n_days") - F.col("total")).alias("residual_scaled"),
            "n_days",
        )
    )
