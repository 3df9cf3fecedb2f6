"""Pipeline batch 99 (north-star extension): exact moments & shape
statistics — skewness/kurtosis from integer power sums, Jarque–Bera,
Bowley quartile skewness, Yule's Q, exact trimmed mean, and Grubbs'
max-outlier statistic, all with the catalog's exact-integer discipline
so Spark and DuckDB agree bit-for-bit.

Exactness conventions (continuing batches 95-98; see catalog.py):
- central moments use the SHIFT trick: pass 1 computes the integer
  offset K = S1 div n, pass 2 sums powers of y = x - K (central
  moments are shift-invariant, and |y| ~ the spread instead of the
  magnitude, so y^4 sums stay inside DECIMAL(38,0)/HUGEINT through
  sf10+ where raw S1^4 would overflow at any scale);
- the scale-free identities g1 = M3/M2^1.5 and g2 = M4/M2^2 - 3 with
  M2 = n^2 m2, M3 = n^3 m3, M4 = n^4 m4 cancel every n-power; the
  power sums s1..s4 stay exact integers and the Mk combinations run
  in ONE fixed double expression shape shared verbatim by both
  engines (n^3*s4 would overflow even 128-bit integers, and the
  shift makes the double combination cancellation-free);
- order statistics (quartiles, trim boundaries) are type-1 inverse
  ECDF values read off the DISTINCT-value cumulative-count table —
  exact integers, no interpolation, the only unpartitioned window is
  |V|-sized.

Scale notes: every query is one or two keyed aggregations plus
arithmetic on a distinct-value table; the two-pass shift adds one
1-row broadcast join. Nothing joins fact rows to fact rows.

Ref semantics: SURVEY §2 A2/O1 compositions; no reference counterpart
(extensions X-MOMENTS .. X-GRUBBS).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.distrank import (
    prefix_sums,
)
from prosnet_prefect_pipelines_spark.plans.catalog import register

# r11: the distinct-order-value cumulations route through the
# distributed two-pass prefix sum (operators/distrank.py) — the |V|
# table is value-cardinality and the single-partition windows were
# latent scale cliffs. Bit-identical (strict prefix = inclusive - c).

# ---------------------------------------------------------------------------
# 1. Exact skewness & kurtosis of order value.

MOMENTS_SQL = """
WITH v AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
),
shift AS (
    SELECT COUNT(*) AS n,
           SUM(CAST(x AS HUGEINT)) // COUNT(*) AS k
    FROM v
),
y AS (SELECT CAST(v.x - shift.k AS HUGEINT) AS y FROM v, shift),
sums AS (
    SELECT COUNT(*) AS n, SUM(y) AS s1, SUM(y * y) AS s2,
           SUM(y * y * y) AS s3, SUM(y * y * y * y) AS s4
    FROM y
),
d AS (
    SELECT CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
           CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
           CAST(s4 AS DOUBLE) AS s4d, n
    FROM sums
),
mom AS (
    SELECT n,
           nd * s2d - s1d * s1d AS m2,
           nd * nd * s3d - 3.0 * nd * s1d * s2d
             + 2.0 * s1d * s1d * s1d AS m3,
           nd * nd * nd * s4d - 4.0 * nd * nd * s1d * s3d
             + 6.0 * nd * s1d * s1d * s2d
             - 3.0 * s1d * s1d * s1d * s1d AS m4
    FROM d
)
SELECT CAST(n AS BIGINT) AS n,
       round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
FROM mom
"""


@register("skewness_kurtosis_exact", oracle=MOMENTS_SQL, covers=["A2"])
def q_skewness_kurtosis_exact(spark, sf_dir):
    """Population skewness g1 = m3/m2^1.5 and excess kurtosis
    g2 = m4/m2^2 - 3 of order value from EXACT integer central-moment
    numerators: with M2 = n^2 m2 = nS2 - S1^2 (and the cubic/quartic
    analogues over shifted values y = x - (S1 div n)), the n-powers
    cancel in both ratios, so each statistic is one double expression
    over exact integers.

    Two narrow aggregations (shift then power sums) + one 1-row
    broadcast; y^4 sums bounded ~ n * spread^4 — inside 38 digits
    through sf10+ where raw x^4 sums would overflow immediately.

    Ref semantics: SURVEY §2 A2 (extension X-MOMENTS)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    shift = v.agg(
        F.count(F.lit(1)).alias("n0"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0))) div count(1) AS DECIMAL(38,0))"
        ).alias("k"),
    )
    y = v.crossJoin(F.broadcast(shift)).select(
        (dec(F.col("x")) - F.col("k")).alias("y")
    )
    sums = y.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
        F.sum(F.col("y") * F.col("y") * F.col("y")).alias("s3"),
        F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y")).alias("s4"),
    )
    n = F.col("n")
    d = sums.select(
        n,
        n.cast("double").alias("nd"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("s3").cast("double").alias("s3d"),
        F.col("s4").cast("double").alias("s4d"),
    )
    nd, s1d, s2d, s3d, s4d = (
        F.col(c) for c in ("nd", "s1d", "s2d", "s3d", "s4d")
    )
    mom = d.select(
        n,
        (nd * s2d - s1d * s1d).alias("m2"),
        (
            nd * nd * s3d
            - F.lit(3.0) * nd * s1d * s2d
            + F.lit(2.0) * s1d * s1d * s1d
        ).alias("m3"),
        (
            nd * nd * nd * s4d
            - F.lit(4.0) * nd * nd * s1d * s3d
            + F.lit(6.0) * nd * s1d * s1d * s2d
            - F.lit(3.0) * s1d * s1d * s1d * s1d
        ).alias("m4"),
    )
    m2d = F.col("m2")
    return mom.select(
        n.cast("long").alias("n"),
        F.round(F.col("m3") / (m2d * F.sqrt(m2d)), 6).alias("skewness"),
        F.round(F.col("m4") / (m2d * m2d) - F.lit(3.0), 6).alias(
            "excess_kurtosis"
        ),
    )


# ---------------------------------------------------------------------------
# 2. Jarque–Bera normality statistic.

JB_SQL = """
WITH v AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
),
shift AS (
    SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) // COUNT(*) AS k FROM v
),
y AS (SELECT CAST(v.x - shift.k AS HUGEINT) AS y FROM v, shift),
sums AS (
    SELECT COUNT(*) AS n, SUM(y) AS s1, SUM(y * y) AS s2,
           SUM(y * y * y) AS s3, SUM(y * y * y * y) AS s4
    FROM y
),
d AS (
    SELECT CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
           CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
           CAST(s4 AS DOUBLE) AS s4d, n
    FROM sums
),
mom AS (
    SELECT n,
           nd * s2d - s1d * s1d AS m2,
           nd * nd * s3d - 3.0 * nd * s1d * s2d
             + 2.0 * s1d * s1d * s1d AS m3,
           nd * nd * nd * s4d - 4.0 * nd * nd * s1d * s3d
             + 6.0 * nd * s1d * s1d * s2d
             - 3.0 * s1d * s1d * s1d * s1d AS m4
    FROM d
),
gg AS (
    SELECT n,
           m3 / (m2 * sqrt(m2)) AS g1,
           m4 / (m2 * m2) - 3.0 AS g2
    FROM mom
)
SELECT CAST(n AS BIGINT) AS n,
       round(g1, 6) AS g1, round(g2, 6) AS g2,
       round(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) AS jb
FROM gg
"""


@register("jarque_bera_stat", oracle=JB_SQL, covers=["A2"])
def q_jarque_bera_stat(spark, sf_dir):
    """Jarque–Bera normality statistic JB = n/6 (g1^2 + g2^2/4) built
    on the same exact integer moment numerators as
    skewness_kurtosis_exact (shift trick + n-power cancellation); the
    only doubles are the two moment ratios and the final combination,
    shared verbatim with the oracle.

    Ref semantics: SURVEY §2 A2 (extension X-JARQUEBERA)."""
    # rebuilds the moment table inline (sharing code with
    # skewness_kurtosis_exact would couple the two plans)
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    shift = v.agg(
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0))) div count(1) AS DECIMAL(38,0))"
        ).alias("k")
    )
    y = v.crossJoin(F.broadcast(shift)).select(
        (dec(F.col("x")) - F.col("k")).alias("y")
    )
    sums = y.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
        F.sum(F.col("y") * F.col("y") * F.col("y")).alias("s3"),
        F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y")).alias("s4"),
    )
    n = F.col("n")
    d = sums.select(
        n,
        n.cast("double").alias("nd"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("s3").cast("double").alias("s3d"),
        F.col("s4").cast("double").alias("s4d"),
    )
    nd, s1d, s2d, s3d, s4d = (
        F.col(c) for c in ("nd", "s1d", "s2d", "s3d", "s4d")
    )
    mom = d.select(
        n,
        (nd * s2d - s1d * s1d).alias("m2"),
        (
            nd * nd * s3d
            - F.lit(3.0) * nd * s1d * s2d
            + F.lit(2.0) * s1d * s1d * s1d
        ).alias("m3"),
        (
            nd * nd * nd * s4d
            - F.lit(4.0) * nd * nd * s1d * s3d
            + F.lit(6.0) * nd * s1d * s1d * s2d
            - F.lit(3.0) * s1d * s1d * s1d * s1d
        ).alias("m4"),
    )
    m2d = F.col("m2")
    gg = mom.select(
        n,
        (F.col("m3") / (m2d * F.sqrt(m2d))).alias("g1"),
        (F.col("m4") / (m2d * m2d) - F.lit(3.0)).alias("g2"),
    )
    return gg.select(
        n.cast("long").alias("n"),
        F.round(F.col("g1"), 6).alias("g1"),
        F.round(F.col("g2"), 6).alias("g2"),
        F.round(
            n.cast("double")
            / F.lit(6.0)
            * (F.col("g1") * F.col("g1") + F.col("g2") * F.col("g2") / F.lit(4.0)),
            6,
        ).alias("jb"),
    )


# ---------------------------------------------------------------------------
# 3. Bowley quartile skewness (type-1 quantiles, exact).

_CUM_CTE = """
counts AS (SELECT x AS v, COUNT(*) AS c FROM v GROUP BY x),
cum AS (
    SELECT v, c,
           SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce
    FROM counts
),
tot AS (SELECT SUM(c) AS n FROM counts),
quart AS (
    SELECT
        (SELECT MIN(v) FROM cum, tot
         WHERE ce >= CAST(ceil(0.25 * n) AS BIGINT)) AS q1,
        (SELECT MIN(v) FROM cum, tot
         WHERE ce >= CAST(ceil(0.50 * n) AS BIGINT)) AS q2,
        (SELECT MIN(v) FROM cum, tot
         WHERE ce >= CAST(ceil(0.75 * n) AS BIGINT)) AS q3
)
"""

BOWLEY_SQL = (
    """
WITH v AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
),
"""
    + _CUM_CTE
    + """
SELECT CAST(q1 AS BIGINT) AS q1_cents, CAST(q2 AS BIGINT) AS q2_cents,
       CAST(q3 AS BIGINT) AS q3_cents,
       round(CAST(q3 + q1 - 2 * q2 AS DOUBLE)
             / CAST(NULLIF(q3 - q1, 0) AS DOUBLE), 6) AS bowley_skew
FROM quart
"""
)


@register("bowley_quartile_skew", oracle=BOWLEY_SQL, covers=["A2", "O1"])
def q_bowley_quartile_skew(spark, sf_dir):
    """Bowley's quartile skewness (q3 + q1 - 2*q2)/(q3 - q1) with
    TYPE-1 (inverse-ECDF) quartiles: q_p = min{v : cum(v) >= ceil(pn)}
    read off the distinct-value cumulative-count table — exact
    integers, no interpolation, deterministic across engines.

    One aggregation + |V|-sized window + a 3-way min; one double
    division.

    Ref semantics: SURVEY §2 A2/O1 (extension X-BOWLEY)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    counts = v.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).alias("c"))
    cum = prefix_sums(
        counts, [F.col("v").asc()], {"ce": F.col("c")}
    )
    tot = cum.agg(F.sum("c").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))
    quart = j.agg(
        F.min(
            F.when(
                F.col("ce") >= F.ceil(F.lit(0.25) * F.col("n")), F.col("v")
            )
        ).alias("q1"),
        F.min(
            F.when(
                F.col("ce") >= F.ceil(F.lit(0.50) * F.col("n")), F.col("v")
            )
        ).alias("q2"),
        F.min(
            F.when(
                F.col("ce") >= F.ceil(F.lit(0.75) * F.col("n")), F.col("v")
            )
        ).alias("q3"),
    )
    return quart.select(
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("q2").cast("long").alias("q2_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        F.round(
            F.try_divide(
                (F.col("q3") + F.col("q1") - 2 * F.col("q2")).cast("double"),
                F.nullif(
                    (F.col("q3") - F.col("q1")).cast("double"), F.lit(0.0)
                ),
            ),
            6,
        ).alias("bowley_skew"),
    )


# ---------------------------------------------------------------------------
# 4. Yule's Q association: deep discount vs returned.

YULESQ_SQL = """
WITH v AS (
    SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS e,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS o
    FROM lineitem
),
cells AS (
    SELECT SUM(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END) AS b,
           SUM(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END) AS d
    FROM v
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(CAST(a * d - b * c AS DOUBLE)
             / CAST(a * d + b * c AS DOUBLE), 6) AS yules_q
FROM cells
"""


@register("yules_q_discount_return", oracle=YULESQ_SQL, covers=["A2"])
def q_yules_q_discount_return(spark, sf_dir):
    """Yule's Q = (ad - bc)/(ad + bc) for deep-discount vs returned
    lineitems — the odds-ratio transform bounded to [-1, 1]; exact
    integer cross products, one double division. One narrow
    aggregation over lineitem.

    Ref semantics: SURVEY §2 A2 (extension X-YULESQ)."""
    v = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_discount") > 0.05).cast("int").alias("e"),
        (F.col("l_returnflag") == "R").cast("int").alias("o"),
    )
    cells = v.agg(
        F.sum(((F.col("e") == 1) & (F.col("o") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("e") == 1) & (F.col("o") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("e") == 0) & (F.col("o") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("e") == 0) & (F.col("o") == 0)).cast("long")).alias("d"),
    )
    ad = F.col("a") * F.col("d")
    bc = F.col("b") * F.col("c")
    return cells.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round((ad - bc).cast("double") / (ad + bc).cast("double"), 6).alias(
            "yules_q"
        ),
    )


# ---------------------------------------------------------------------------
# 5. Exact 10% trimmed mean of order value.

TRIMMED_SQL = """
WITH v AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
),
counts AS (SELECT x AS v, COUNT(*) AS c FROM v GROUP BY x),
cum AS (
    SELECT v, c,
           SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
           COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM counts
),
tot AS (
    SELECT SUM(c) AS n, SUM(CAST(v AS HUGEINT) * c) AS s,
           CAST(SUM(c) // 10 AS BIGINT) AS trim
    FROM counts
),
lo AS (
    SELECT SUM(CAST(v AS HUGEINT)
               * (CASE WHEN ce <= trim THEN c
                       WHEN cb < trim THEN trim - cb
                       ELSE 0 END)) AS cut
    FROM cum, tot
),
hi AS (
    SELECT SUM(CAST(v AS HUGEINT)
               * (CASE WHEN n - cb <= trim THEN c
                       WHEN n - ce < trim THEN trim - (n - ce)
                       ELSE 0 END)) AS cut
    FROM cum, tot
)
SELECT CAST(tot.n AS BIGINT) AS n, CAST(tot.trim AS BIGINT) AS trimmed_each,
       round(CAST(tot.s - lo.cut - hi.cut AS DOUBLE)
             / CAST(tot.n - 2 * tot.trim AS DOUBLE) / 100.0, 6)
           AS trimmed_mean_dollars
FROM tot, lo, hi
"""


@register("trimmed_mean_orders", oracle=TRIMMED_SQL, covers=["A2", "O1"])
def q_trimmed_mean_orders(spark, sf_dir):
    """Exact 10% two-sided trimmed mean of order value: drop the
    floor(n/10) smallest and largest observations and average the
    rest. The trimmed tails are summed from the distinct-value
    cumulative-count table with exact partial-block arithmetic
    (boundary value contributes v*(trim - cum_before)) — no per-row
    rank, no sort of the fact table.

    Ref semantics: SURVEY §2 A2/O1 (extension X-TRIMMEAN)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    counts = v.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).alias("c"))
    cum = prefix_sums(
        counts, [F.col("v").asc()], {"ce": F.col("c")}
    )
    cum = cum.withColumn("cb", F.col("ce") - F.col("c"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = counts.agg(
        F.sum("c").alias("n"),
        F.sum(dec(F.col("v")) * F.col("c")).alias("s"),
        F.expr("CAST(sum(c) div 10 AS BIGINT)").alias("trim"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    lo = j.agg(
        F.sum(
            dec(F.col("v"))
            * F.when(F.col("ce") <= F.col("trim"), F.col("c"))
            .when(F.col("cb") < F.col("trim"), F.col("trim") - F.col("cb"))
            .otherwise(F.lit(0))
        ).alias("cut_lo")
    )
    hi = j.agg(
        F.sum(
            dec(F.col("v"))
            * F.when(F.col("n") - F.col("cb") <= F.col("trim"), F.col("c"))
            .when(
                F.col("n") - F.col("ce") < F.col("trim"),
                F.col("trim") - (F.col("n") - F.col("ce")),
            )
            .otherwise(F.lit(0))
        ).alias("cut_hi")
    )
    return (
        tot.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("trim").cast("long").alias("trimmed_each"),
            F.round(
                (F.col("s") - F.col("cut_lo") - F.col("cut_hi")).cast("double")
                / (F.col("n") - 2 * F.col("trim")).cast("double")
                / F.lit(100.0),
                6,
            ).alias("trimmed_mean_dollars"),
        )
    )


# ---------------------------------------------------------------------------
# 6. Grubbs' max-outlier statistic.

GRUBBS_SQL = """
WITH v AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
),
agg AS (
    SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s,
           SUM(CAST(x AS HUGEINT) * x) AS q
    FROM v
),
dev AS (
    SELECT MAX(abs(agg.n * CAST(v.x AS HUGEINT) - agg.s)) AS maxdev
    FROM v, agg
)
SELECT CAST(agg.n AS BIGINT) AS n,
       CAST(dev.maxdev AS BIGINT) AS max_scaled_dev,
       round(CAST(dev.maxdev AS DOUBLE)
             / sqrt(CAST(agg.n AS DOUBLE)
                    * CAST(agg.n * agg.q - agg.s * agg.s AS DOUBLE)
                    / (agg.n - 1)), 6) AS g
FROM agg, dev
"""


@register("grubbs_max_outlier", oracle=GRUBBS_SQL, covers=["A2"])
def q_grubbs_max_outlier(spark, sf_dir):
    """Grubbs' statistic G = max|x - mean| / s with sample s: using
    the scaled deviation n*x - S (exact) this is
    G = max|nx - S| / sqrt(n*(nQ - S^2)/(n-1)) — numerator and
    radicand exact integers, one shared double expression.

    Two aggregations + one 1-row broadcast; max|nx - S| streams
    map-side.

    Ref semantics: SURVEY §2 A2 (extension X-GRUBBS)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    dev = (
        v.crossJoin(F.broadcast(agg))
        .select(F.abs(F.col("n") * dec(F.col("x")) - F.col("s")).alias("d"))
        .agg(F.max("d").alias("maxdev"))
    )
    return agg.crossJoin(F.broadcast(dev)).select(
        F.col("n").cast("long").alias("n"),
        F.col("maxdev").cast("long").alias("max_scaled_dev"),
        F.round(
            F.col("maxdev").cast("double")
            / F.sqrt(
                F.col("n").cast("double")
                * (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast(
                    "double"
                )
                / (F.col("n") - 1)
            ),
            6,
        ).alias("g"),
    )
