"""Pipeline batch 71 (north-star extension): hierarchical & statistical
modeling ops — bill-of-materials explosion, exact OLS slopes, binary-
segmentation changepoints, churn hazard curves, and cohort LTV
triangles.

Exactness discipline: BOM quantities multiply as integers along paths;
OLS is emitted as (numerator, denominator, truncated micro slope);
the changepoint criterion is identical scaled-integer arithmetic in
both engines (argmax of equal integers can't diverge); hazards and LTV
are truncating ppm / exact cents."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# bill-of-materials explosion: 3-level quantity rollup.

# Deterministic synthetic assembly graph over part keys: part p contains
# component (p * 7 + 3) % M with per-edge quantity (p % 4) + 1, for two
# "contains" hops below each root. M scales with the part table so the
# graph keeps constant shape at any sf. Roots: p % 50 == 0.
BOM_SQL = """
WITH m AS (SELECT COUNT(*) AS m FROM part),
e AS (
    SELECT p_partkey AS parent,
           (p_partkey * 7 + 3) % m.m AS child,
           p_partkey % 4 + 1 AS qty
    FROM part, m
    WHERE p_partkey <> (p_partkey * 7 + 3) % m.m
),
roots AS (SELECT p_partkey AS root FROM part WHERE p_partkey % 50 = 0),
l1 AS (
    SELECT r.root, e.child AS part, CAST(e.qty AS BIGINT) AS qty, 1 AS lvl
    FROM roots r JOIN e ON e.parent = r.root
),
l2 AS (
    SELECT l1.root, e.child AS part, l1.qty * e.qty AS qty, 2 AS lvl
    FROM l1 JOIN e ON e.parent = l1.part
),
all_ AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
SELECT CAST(root AS BIGINT) AS root, CAST(part AS BIGINT) AS part,
       CAST(MAX(lvl) AS INT) AS deepest_lvl,
       CAST(SUM(qty) AS BIGINT) AS total_qty
FROM all_ GROUP BY root, part
"""


@register("bom_explosion", oracle=BOM_SQL, covers=["J5", "A2", "J1"])
def q_bom_explosion(spark, sf_dir):
    """Bill-of-materials explosion: per (root assembly, component), the
    total required quantity across a 2-hop contains-graph — quantities
    MULTIPLY along each path and SUM across paths (the semiring the
    plain transitive closure lacks). Levels expand as keyed joins
    against the edge table (each hop one equi join — at scale the edge
    table shuffles once per level, exactly like the frontier closure);
    the final rollup groups (root, part)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    m = part.count()  # parquet metadata count
    k = F.col("p_partkey")
    e = part.select(
        k.alias("parent"),
        ((k * 7 + 3) % m).alias("child"),
        (k % 4 + 1).cast("long").alias("qty"),
    ).filter(F.col("parent") != F.col("child"))
    roots = part.filter(k % 50 == 0).select(k.alias("root"))
    l1 = roots.join(e, roots["root"] == e["parent"]).select(
        "root", F.col("child").alias("part"), F.col("qty"), F.lit(1).alias("lvl")
    )
    e2 = e.select(
        F.col("parent").alias("p2"), F.col("child").alias("c2"),
        F.col("qty").alias("q2"),
    )
    l2 = l1.join(e2, l1["part"] == e2["p2"]).select(
        "root",
        F.col("c2").alias("part"),
        (F.col("qty") * F.col("q2")).alias("qty"),
        F.lit(2).alias("lvl"),
    )
    all_ = l1.unionByName(l2)
    return all_.groupBy("root", "part").agg(
        F.max("lvl").cast("int").alias("deepest_lvl"),
        F.sum("qty").cast("long").alias("total_qty"),
    ).select(
        F.col("root").cast("long").alias("root"),
        F.col("part").cast("long").alias("part"),
        "deepest_lvl",
        "total_qty",
    )


# ---------------------------------------------------------------------------
# exact OLS slope per group.

OLS_SQL = """
WITH pts AS (
    SELECT l_suppkey % 25 AS grp,
           CAST(round(l_quantity) AS BIGINT) AS x,
           CAST(round(l_extendedprice) AS BIGINT) AS y
    FROM lineitem
),
s AS (
    SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
           CAST(SUM(x * y) AS HUGEINT) AS sxy, CAST(SUM(x * x) AS HUGEINT) AS sxx
    FROM pts GROUP BY grp
)
SELECT CAST(grp AS BIGINT) AS grp, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT)
           AS slope_micro,
       CAST((sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) * 1000000
            // (n * (n * sxx - sx * sx)) AS BIGINT) AS intercept_micro
FROM s
"""


@register("ols_slope_exact", oracle=OLS_SQL, covers=["A2"])
def q_ols_slope_exact(spark, sf_dir):
    """Per-group OLS regression of price on quantity with NO floating
    point: the slope is carried as its exact integer (numerator,
    denominator) pair plus truncated micro values for slope and
    intercept — the closed-form normal equations as pure wide-integer
    sums. One partial-aggregated stats pass per group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = "DECIMAL(38,0)"
    pts = li.select(
        (F.col("l_suppkey") % 25).alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    s = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum("x").cast(d).alias("sx"),
        F.sum("y").cast(d).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d).alias("sxx"),
    )
    return s.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            "CAST((sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) * 1000000"
            " div (n * (n * sxx - sx * sx)) AS BIGINT)"
        ).alias("intercept_micro"),
    )


# ---------------------------------------------------------------------------
# single changepoint by binary segmentation over the daily error series.

CHANGEPOINT_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errs
    FROM events GROUP BY day
),
idx AS (
    SELECT day, errs,
           row_number() OVER (ORDER BY day) AS i,
           SUM(errs) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cs,
           COUNT(*) OVER () AS n,
           SUM(errs) OVER () AS tot
    FROM daily
),
cand AS (
    -- criterion(k) = s1^2/n1 + s2^2/n2, scaled to integer micro by the
    -- IDENTICAL arithmetic in both engines: argmax of equal integers
    SELECT i AS k, day,
           cs * cs * 1000000 // i
         + (tot - cs) * (tot - cs) * 1000000 // (n - i) AS crit
    FROM idx WHERE i < n
)
SELECT CAST(k AS BIGINT) AS split_index,
       CAST(day AS VARCHAR) AS split_day,
       CAST(crit AS BIGINT) AS criterion_micro
FROM cand
ORDER BY crit DESC, k LIMIT 1
"""


@register("changepoint_binary_split", oracle=CHANGEPOINT_SQL, covers=["A2", "O1"])
def q_changepoint_binary_split(spark, sf_dir):
    """Single changepoint via binary segmentation: the split of the
    daily error series maximizing s1²/n1 + s2²/n2 (equivalently,
    minimizing within-segment sum of squares) — evaluated for every
    split from ONE cumulative-sum window over the bounded daily series,
    compared in identical scaled-integer arithmetic so both engines
    pick the same argmax. TakeOrdered top-1."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errs")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "day",
        "errs",
        F.row_number().over(w).alias("i"),
        F.sum("errs").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("errs").over(wall).alias("tot"),
    )
    cand = idx.filter(F.col("i") < F.col("n")).select(
        F.col("i").alias("k"),
        "day",
        F.expr(
            "cs * cs * 1000000 div i + (tot - cs) * (tot - cs) * 1000000 div (n - i)"
        ).alias("crit"),
    )
    return (
        cand.orderBy(F.col("crit").desc(), F.col("k"))
        .limit(1)
        .select(
            F.col("k").cast("long").alias("split_index"),
            F.col("day").cast("string").alias("split_day"),
            F.col("crit").cast("long").alias("criterion_micro"),
        )
    )


# ---------------------------------------------------------------------------
# churn hazard curve by day-offset from signup.

HAZARD_SQL = """
WITH s AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
    WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY user_id
),
last_seen AS (
    SELECT e.user_id, date_diff('day', s.d0, MAX(CAST(e.ts AS DATE))) AS last_off
    FROM events e JOIN s ON s.user_id = e.user_id
    GROUP BY e.user_id, s.d0
),
spine AS (
    SELECT CAST(o.o AS BIGINT) AS off FROM generate_series(0, 60) o(o)
),
curve AS (
    SELECT sp.off,
           COUNT(CASE WHEN l.last_off >= sp.off THEN 1 END) AS n_at_risk,
           COUNT(CASE WHEN l.last_off = sp.off THEN 1 END) AS n_last
    FROM spine sp CROSS JOIN last_seen l
    GROUP BY sp.off
)
SELECT off, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_last AS BIGINT) AS n_churned_here,
       CAST(CASE WHEN n_at_risk > 0
                 THEN CAST(n_last AS HUGEINT) * 1000000 // n_at_risk END
            AS BIGINT) AS hazard_ppm
FROM curve WHERE n_at_risk > 0
"""


@register("churn_hazard_report", oracle=HAZARD_SQL, covers=["A2", "J1"])
def q_churn_hazard_report(spark, sf_dir):
    """Discrete churn hazard: for each day-offset since signup, the
    users whose LAST activity falls exactly there over those still at
    risk — h(t) = P(churn at t | survived to t) in truncating ppm, the
    survival-analysis primitive (the KM product is a driver-side fold
    over this bounded curve). The 61-row offset spine fans out as a
    broadcast cross join against the per-user last-offset table."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    days = ev.select(
        "user_id",
        "event_type",
        F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("d"),
    )
    s = (
        days.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("d").alias("d0"))
    )
    last_seen = (
        days.join(s, "user_id")
        .groupBy("user_id", "d0")
        .agg(F.max("d").alias("dl"))
        .select("user_id", F.datediff("dl", "d0").alias("last_off"))
    )
    spine = spark.range(0, 61).select(F.col("id").cast("long").alias("off"))
    curve = (
        F.broadcast(spine)
        .crossJoin(last_seen)
        .groupBy("off")
        .agg(
            F.count(F.when(F.col("last_off") >= F.col("off"), 1)).alias(
                "n_at_risk"
            ),
            F.count(F.when(F.col("last_off") == F.col("off"), 1)).alias("n_last"),
        )
        .filter(F.col("n_at_risk") > 0)
    )
    return curve.select(
        "off",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_last").cast("long").alias("n_churned_here"),
        F.expr(
            "CAST(CASE WHEN n_at_risk > 0 THEN "
            "CAST(n_last AS DECIMAL(38,0)) * 1000000 div n_at_risk END AS BIGINT)"
        ).alias("hazard_ppm"),
    )


# ---------------------------------------------------------------------------
# cohort LTV triangle.

LTV_SQL = """
WITH s AS (
    SELECT user_id, strftime(MIN(CAST(ts AS DATE)), '%Y-%m') AS cohort,
           MIN(CAST(ts AS DATE)) AS d0
    FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL
    GROUP BY user_id
),
p AS (
    SELECT e.user_id, s.cohort,
           date_diff('month', date_trunc('month', s.d0),
                     date_trunc('month', CAST(e.ts AS DATE))) AS m_off,
           CAST(round(e.value * 100) AS BIGINT) AS cents
    FROM events e JOIN s ON s.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= s.d0
),
cell AS (
    SELECT cohort, m_off, SUM(cents) AS cents,
           COUNT(DISTINCT user_id) AS buyers
    FROM p WHERE m_off >= 0 GROUP BY cohort, m_off
),
size_ AS (SELECT cohort, COUNT(*) AS cohort_users FROM s GROUP BY cohort)
SELECT c.cohort, CAST(c.m_off AS BIGINT) AS m_off,
       CAST(c.cents AS BIGINT) AS cents,
       CAST(c.buyers AS BIGINT) AS buyers,
       CAST(z.cohort_users AS BIGINT) AS cohort_users,
       CAST(SUM(c.cents) OVER (PARTITION BY c.cohort ORDER BY c.m_off
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_cents,
       CAST(CAST(SUM(c.cents) OVER (PARTITION BY c.cohort ORDER BY c.m_off
                                    ROWS UNBOUNDED PRECEDING) AS HUGEINT)
            // z.cohort_users AS BIGINT) AS ltv_cents_per_user
FROM cell c JOIN size_ z USING (cohort)
"""


@register("cohort_ltv_triangle", oracle=LTV_SQL, covers=["A1", "A2", "J1", "O1"])
def q_cohort_ltv_triangle(spark, sf_dir):
    """Cohort LTV triangle: purchase revenue per (signup-month cohort,
    month offset) with the running cumulative and per-user LTV in exact
    cents — the retention-economics table every growth model is fit on.
    Cohort sizes broadcast; the cumulative window partitions by cohort
    over the bounded month-offset series."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    days = ev.select(
        "user_id",
        "event_type",
        F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = (
        days.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("d").alias("d0"))
        .select(
            "user_id", "d0", F.date_format("d0", "yyyy-MM").alias("cohort")
        )
    )
    p = (
        days.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("d") >= F.col("d0"))
        .select(
            "user_id",
            "cohort",
            (
                F.months_between(
                    F.trunc("d", "month"), F.trunc("d0", "month")
                )
            ).cast("long").alias("m_off"),
            "cents",
        )
        .filter(F.col("m_off") >= 0)
    )
    cell = p.groupBy("cohort", "m_off").agg(
        F.sum("cents").alias("cents"),
        F.countDistinct("user_id").alias("buyers"),
    )
    size_ = s.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("m_off")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(size_), "cohort")
        .select(
            "cohort",
            F.col("m_off").cast("long").alias("m_off"),
            F.col("cents").cast("long").alias("cents"),
            F.col("buyers").cast("long").alias("buyers"),
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.sum("cents").over(w).cast("long").alias("cum_cents"),
        )
        .withColumn(
            "ltv_cents_per_user",
            F.expr(
                "CAST(CAST(cum_cents AS DECIMAL(38,0)) div cohort_users AS BIGINT)"
            ),
        )
    )
