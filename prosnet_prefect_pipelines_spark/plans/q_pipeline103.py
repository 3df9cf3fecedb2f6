"""Pipeline batch 103 (north-star extension): time-series
diagnostics on the monthly revenue series — Mann–Kendall trend,
turning-point randomness, record counting, drawdown, longest
monotone runs and mean crossings.

These are the nonparametric screens a pipeline runs over a KPI
series before fitting anything: Mann–Kendall detects monotone trend
without distributional assumptions, turning points / records / mean
crossings test the iid hypothesis, drawdown and monotone runs
summarize worst-case excursions.

Exactness conventions (the batch-95/99 discipline):
- the series is SUM(order cents) per calendar month — exact BIGINT
  sums keyed by k = year*12 + month;
- Mann–Kendall S is a pure integer pair sum; its tie-corrected
  variance keeps the /18 numerator integer (HUGEINT/DECIMAL) and
  divides once at the end;
- mean crossings avoid the rational mean: compare n*x_i against the
  integer total S instead (same scaled-deviation trick as
  cusum_drift);
- expected record count is the harmonic number H_n, summed from
  6-dp-rounded 1/i terms in scaled BIGINT micro-units.

Scale notes: the fact-table work is ONE narrow month-keyed
aggregation (map-side combinable); every window/self-join after it
runs on the |months|-sized series, which is bounded by the calendar
(80 rows here, a few thousand for decades of minutes-to-months
rollups) — the Mann–Kendall pair join is quadratic ONLY in months,
never in orders, and the single-partition windows hold 80 rows by
construction.

Ref semantics: SURVEY §2 A2/F16/O1 compositions; no reference
counterpart (extensions X-MANNKENDALL .. X-MEANCROSS).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# monthly revenue series: k = year*12 + month, x = exact cent total
_MONTHLY_CTE = """
m AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                + EXTRACT(month FROM o_orderdate) AS BIGINT) AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
)
"""


def _monthly(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("k"),
            cents.alias("c"),
        )
        .groupBy("k")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).cast("long").alias("x"))
    )


# ---------------------------------------------------------------------------
# 1. Mann–Kendall trend test (exact integer S, tie-corrected variance).

MANN_KENDALL_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
s AS (
    SELECT SUM(CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END) AS s_stat
    FROM m a JOIN m b ON a.k < b.k
),
n AS (SELECT COUNT(*) AS n FROM m),
ties AS (
    SELECT COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0) AS tt
    FROM (SELECT COUNT(*) AS t FROM m GROUP BY x) WHERE t > 1
),
v AS (
    SELECT CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tt AS DOUBLE)
           / 18.0 AS var_s
    FROM n CROSS JOIN ties
)
SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n_months,
       CAST(s_stat AS BIGINT) AS s_stat,
       round(var_s, 6) AS var_s_6,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z_6
FROM s CROSS JOIN v
"""
)


@register("mann_kendall_monthly", oracle=MANN_KENDALL_SQL, covers=["A2", "F16", "J1"])
def q_mann_kendall_monthly(spark, sf_dir):
    """Mann–Kendall monotone-trend test on monthly revenue: the exact
    integer S = sum over month pairs of sign(x_j - x_i), the
    tie-corrected variance [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18 kept
    as an integer numerator, and the continuity-corrected z. The pair
    join is quadratic only in MONTHS (calendar-bounded), never in
    orders.

    Ref semantics: SURVEY §2 A2/F16 (extension X-MANNKENDALL)."""
    m = _monthly(spark, sf_dir)
    a, b = m.alias("a"), m.alias("b")
    sgn = (
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
    )
    s = a.join(b, F.col("a.k") < F.col("b.k")).agg(
        F.sum(sgn).alias("s_stat")
    )
    n = m.agg(F.count(F.lit(1)).alias("n"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ties = (
        m.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(dec(F.col("t")) * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("tt")
        )
    )
    var_s = (
        dec(F.col("n")) * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tt")
    ).cast("double") / 18.0
    z = (
        F.when(
            F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s"))
        )
        .when(
            F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s"))
        )
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .withColumn("var_s", var_s)
        .select(
            F.col("n").cast("long").alias("n_months"),
            F.col("s_stat").cast("long").alias("s_stat"),
            F.round(F.col("var_s"), 6).alias("var_s_6"),
            F.round(z, 6).alias("z_6"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Turning-point test of randomness.

TURNING_POINTS_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
lagged AS (
    SELECT x,
           LAG(x) OVER (ORDER BY k) AS xp,
           LEAD(x) OVER (ORDER BY k) AS xn
    FROM m
),
agg AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
                     AND ((x > xp AND x > xn) OR (x < xp AND x < xn))
                    THEN 1 ELSE 0 END) AS tp
    FROM lagged
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(tp AS BIGINT) AS turning_points,
       round(2.0 * (n - 2) / 3.0, 6) AS expected_6,
       round((16.0 * n - 29.0) / 90.0, 6) AS variance_6,
       round((tp - 2.0 * (n - 2) / 3.0)
             / sqrt((16.0 * n - 29.0) / 90.0), 6) AS z_6
FROM agg
"""
)


@register("turning_points_monthly", oracle=TURNING_POINTS_SQL, covers=["A2", "O1"])
def q_turning_points_monthly(spark, sf_dir):
    """Turning-point randomness test: count of strict local extrema
    in the monthly series vs the iid expectation 2(n-2)/3 with
    variance (16n-29)/90. One lag/lead window over the
    calendar-bounded series (single partition by construction).

    Ref semantics: SURVEY §2 A2/O1 (extension X-TURNPOINTS)."""
    m = _monthly(spark, sf_dir)
    w = Window.orderBy("k")
    lagged = m.select(
        F.col("x"),
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    )
    is_tp = (
        F.col("xp").isNotNull()
        & F.col("xn").isNotNull()
        & (
            ((F.col("x") > F.col("xp")) & (F.col("x") > F.col("xn")))
            | ((F.col("x") < F.col("xp")) & (F.col("x") < F.col("xn")))
        )
    )
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_tp.cast("int")).alias("tp"),
    )
    nd = F.col("n").cast("double")
    exp = 2.0 * (nd - 2) / 3.0
    var = (16.0 * nd - 29.0) / 90.0
    return agg.select(
        F.col("n").cast("long").alias("n_months"),
        F.col("tp").cast("long").alias("turning_points"),
        F.round(exp, 6).alias("expected_6"),
        F.round(var, 6).alias("variance_6"),
        F.round((F.col("tp") - exp) / F.sqrt(var), 6).alias("z_6"),
    )


# ---------------------------------------------------------------------------
# 3. Record months (running extrema) vs the iid harmonic expectation.

RECORD_MONTHS_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
r AS (
    SELECT x,
           MAX(x) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS rmax,
           MIN(x) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS rmin
    FROM m
),
agg AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN rmax IS NULL OR x > rmax THEN 1 ELSE 0 END) AS hi,
           SUM(CASE WHEN rmin IS NULL OR x < rmin THEN 1 ELSE 0 END) AS lo
    FROM r
),
harm AS (
    SELECT SUM(CAST(round(round(1.0 / i, 6) * 1000000, 0) AS BIGINT)) AS h6
    FROM agg, unnest(generate_series(1, CAST(n AS BIGINT))) t(i)
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(hi AS BIGINT) AS record_highs,
       CAST(lo AS BIGINT) AS record_lows,
       round(CAST(h6 AS BIGINT) / 1000000.0, 6) AS expected_records_6
FROM agg CROSS JOIN harm
"""
)


@register("record_months_monthly", oracle=RECORD_MONTHS_SQL, covers=["A2", "O1"])
def q_record_months_monthly(spark, sf_dir):
    """Record counting: months setting a new all-time revenue high or
    low (the first month counts as both) vs the iid expectation — the
    harmonic number H_n, summed from 6-dp 1/i terms in scaled BIGINT
    micro-units. Running-extrema windows over the calendar-bounded
    series only.

    Ref semantics: SURVEY §2 A2/O1 (extension X-RECORDS)."""
    m = _monthly(spark, sf_dir)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    r = m.select(
        F.col("x"),
        F.max("x").over(w).alias("rmax"),
        F.min("x").over(w).alias("rmin"),
    )
    agg = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("rmax").isNull() | (F.col("x") > F.col("rmax"))).cast("int")
        ).alias("hi"),
        F.sum(
            (F.col("rmin").isNull() | (F.col("x") < F.col("rmin"))).cast("int")
        ).alias("lo"),
    )
    harm = (
        agg.select(
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n").cast("long"))
            ).alias("i")
        )
        .select(
            F.round(F.round(1.0 / F.col("i"), 6) * 1000000, 0)
            .cast("long")
            .alias("t6")
        )
        .agg(F.sum("t6").alias("h6"))
    )
    return agg.crossJoin(F.broadcast(harm)).select(
        F.col("n").cast("long").alias("n_months"),
        F.col("hi").cast("long").alias("record_highs"),
        F.col("lo").cast("long").alias("record_lows"),
        F.round(F.col("h6") / 1000000.0, 6).alias("expected_records_6"),
    )


# ---------------------------------------------------------------------------
# 4. Maximum drawdown of the monthly series.

DRAWDOWN_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
r AS (
    SELECT k, x,
           MAX(x) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS peak
    FROM m
),
dd AS (SELECT k, x, peak, peak - x AS draw FROM r),
best AS (
    SELECT draw, k, peak FROM dd
    ORDER BY draw DESC, k ASC LIMIT 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
       CAST(draw AS BIGINT) AS max_drawdown_cents,
       CAST(k AS BIGINT) AS trough_month_key,
       CAST(peak AS BIGINT) AS peak_cents,
       round(CAST(draw AS DOUBLE) / CAST(peak AS DOUBLE), 6)
           AS drawdown_share_6
FROM best
"""
)


@register("revenue_drawdown_monthly", oracle=DRAWDOWN_SQL, covers=["A2", "O1", "O6"])
def q_revenue_drawdown_monthly(spark, sf_dir):
    """Maximum drawdown: the deepest peak-to-trough revenue decline —
    draw_k = runningmax(x) - x_k, maximized over months (earliest
    trough on ties, O6 min-by semantics via struct ordering). Exact
    integer cents end to end; one running-max window + one 1-row
    reduction over the calendar-bounded series.

    Ref semantics: SURVEY §2 A2/O1/O6 (extension X-DRAWDOWN)."""
    m = _monthly(spark, sf_dir)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    dd = m.select(
        F.col("k"),
        F.col("x"),
        F.max("x").over(w).alias("peak"),
    ).withColumn("draw", F.col("peak") - F.col("x"))
    best = dd.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.struct(
                F.col("draw"), (-F.col("k")).alias("nk"), F.col("peak")
            )
        ).alias("b"),
    )
    return best.select(
        F.col("n").cast("long").alias("n_months"),
        F.col("b.draw").cast("long").alias("max_drawdown_cents"),
        (-F.col("b.nk")).cast("long").alias("trough_month_key"),
        F.col("b.peak").cast("long").alias("peak_cents"),
        F.round(
            F.col("b.draw").cast("double") / F.col("b.peak").cast("double"), 6
        ).alias("drawdown_share_6"),
    )


# ---------------------------------------------------------------------------
# 5. Longest strictly monotone runs.

MONO_RUNS_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
steps AS (
    SELECT k, x,
           CASE WHEN x > LAG(x) OVER (ORDER BY k) THEN 1 ELSE 0 END AS up,
           CASE WHEN x < LAG(x) OVER (ORDER BY k) THEN 1 ELSE 0 END AS dn
    FROM m
),
isl AS (
    SELECT up, dn,
           SUM(1 - up) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS gu,
           SUM(1 - dn) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS gd
    FROM steps
),
ups AS (
    SELECT COALESCE(MAX(c), 0) AS longest_up FROM (
        SELECT COUNT(*) AS c FROM isl WHERE up = 1 GROUP BY gu
    )
),
dns AS (
    SELECT COALESCE(MAX(c), 0) AS longest_dn FROM (
        SELECT COUNT(*) AS c FROM isl WHERE dn = 1 GROUP BY gd
    )
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
       CAST(longest_up AS BIGINT) AS longest_up_steps,
       CAST(longest_dn AS BIGINT) AS longest_down_steps
FROM ups CROSS JOIN dns
"""
)


@register("monotone_runs_monthly", oracle=MONO_RUNS_SQL, covers=["A2", "O1"])
def q_monotone_runs_monthly(spark, sf_dir):
    """Longest strictly increasing / decreasing step runs in the
    monthly series (gaps-and-islands: a non-up step closes an up
    island, so consecutive up-steps share one island id). Pure
    integer counting over the calendar-bounded series.

    Ref semantics: SURVEY §2 A2/O1 (extension X-MONORUN)."""
    m = _monthly(spark, sf_dir)
    w = Window.orderBy("k")
    cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    steps = m.select(
        F.col("k"),
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("up"),
        F.when(F.col("x") < F.lag("x").over(w), 1).otherwise(0).alias("dn"),
    )
    isl = steps.select(
        F.col("up"),
        F.col("dn"),
        F.sum(1 - F.col("up")).over(cum).alias("gu"),
        F.sum(1 - F.col("dn")).over(cum).alias("gd"),
    )
    ups = (
        isl.where(F.col("up") == 1)
        .groupBy("gu")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.max("c"), F.lit(0)).alias("longest_up"))
    )
    dns = (
        isl.where(F.col("dn") == 1)
        .groupBy("gd")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.max("c"), F.lit(0)).alias("longest_dn"))
    )
    n = m.agg(F.count(F.lit(1)).alias("n"))
    return (
        n.crossJoin(F.broadcast(ups))
        .crossJoin(F.broadcast(dns))
        .select(
            F.col("n").cast("long").alias("n_months"),
            F.col("longest_up").cast("long").alias("longest_up_steps"),
            F.col("longest_dn").cast("long").alias("longest_down_steps"),
        )
    )


# ---------------------------------------------------------------------------
# 6. Mean crossings (scaled-deviation sign flips).

MEAN_CROSS_SQL = (
    "WITH "
    + _MONTHLY_CTE
    + """,
tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM m),
sg AS (
    SELECT k, CASE WHEN CAST(n AS HUGEINT) * x > s THEN 1
                   WHEN CAST(n AS HUGEINT) * x < s THEN -1
                   ELSE 0 END AS sgn
    FROM m CROSS JOIN tot
),
fl AS (
    SELECT sgn, LAG(sgn) OVER (ORDER BY k) AS prev FROM sg
)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_months,
       CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND sgn * prev = -1
                     THEN 1 ELSE 0 END) AS BIGINT) AS crossings
FROM fl
"""
)


@register("mean_crossings_monthly", oracle=MEAN_CROSS_SQL, covers=["A2", "O1"])
def q_mean_crossings_monthly(spark, sf_dir):
    """Mean-crossing count: strict sign flips of the series around
    its mean, comparing n*x_i against the integer total S so the
    rational mean never materializes (the cusum_drift scaling trick).
    One lag window over the calendar-bounded series.

    Ref semantics: SURVEY §2 A2/O1 (extension X-MEANCROSS)."""
    m = _monthly(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = m.agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec(F.col("x"))).alias("s")
    )
    sg = m.crossJoin(F.broadcast(tot)).select(
        F.col("k"),
        F.when(dec(F.col("n")) * F.col("x") > F.col("s"), 1)
        .when(dec(F.col("n")) * F.col("x") < F.col("s"), -1)
        .otherwise(0)
        .alias("sgn"),
        F.col("n"),
    )
    w = Window.orderBy("k")
    fl = sg.select(
        F.col("n"),
        F.col("sgn"),
        F.lag("sgn").over(w).alias("prev"),
    )
    return fl.agg(
        F.max("n").cast("long").alias("n_months"),
        F.sum((F.col("sgn") == 1).cast("int")).cast("long").alias("n_above"),
        F.sum((F.col("sgn") == -1).cast("int")).cast("long").alias("n_below"),
        F.sum((F.col("sgn") == 0).cast("int")).cast("long").alias("n_equal"),
        F.sum(
            (F.col("prev").isNotNull() & (F.col("sgn") * F.col("prev") == -1))
            .cast("int")
        )
        .cast("long")
        .alias("crossings"),
    )
