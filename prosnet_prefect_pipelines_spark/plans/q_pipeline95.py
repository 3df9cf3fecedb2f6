"""Pipeline batch 95 (north-star extension): exact classical statistics
suite 2 — time-series autocorrelation, robust regression, one-way
ANOVA, categorical association, and model-quality audits, all computed
with the catalog's exact-integer discipline so both engines agree
bit-for-bit.

Exactness conventions used throughout (see catalog.py docstring):
- money/values scaled to integer cents / micros BEFORE any aggregation;
- wide products (y², v²) go through DECIMAL(38,0) on Spark and HUGEINT
  on DuckDB — both exact, both converting to DOUBLE with correct
  rounding at the single final division;
- double sums over per-GROUP terms (k small) run as ORDERED folds over
  an array sorted by the group key — ((0+t1)+t2)+... is the identical
  IEEE sequence in both engines (the label_centroids trick);
- ISO day-of-week derived by pure integer arithmetic from the epoch
  day (pmod(day + 3, 7) + 1 with a FLOOR-division epoch day on both
  engines — Spark `div` truncates toward zero, so the day is computed
  as (us - pmod(us, 86400000000)) div 86400000000; DuckDB's `//`
  already floors but its `%` keeps the dividend sign, wrapped with
  (+7)%7), sidestepping Spark-dayofweek-vs-DuckDB-isodow convention
  drift and pre-1970 negative-epoch drift entirely (regression test:
  tests/test_pipeline95.py).

Scale notes: every query is one or two keyed aggregations (map-side
combinable) over narrow projections; the only quadratic piece is
Theil–Sen's within-nation month-pair join, which is bounded by
(months per nation choose 2) ~ 3.2k pairs per key independent of row
count — the per-key work is constant as the fact table grows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# 1. Autocorrelation function of the daily-revenue series, lags 1..7.

ACF_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
idx AS (
    SELECT row_number() OVER (ORDER BY day) AS i, cents FROM daily
),
tot AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM idx),
centered AS (
    -- y_i = n*x_i - S: the n-scaled centered value is an exact BIGINT;
    -- num/den below are both 1/n^2-scaled, so the factor cancels
    SELECT i, CAST(tot.n AS BIGINT) * cents - tot.s AS y FROM idx, tot
),
den AS (
    SELECT SUM(CAST(y AS HUGEINT) * y) AS d FROM centered
),
lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
num AS (
    SELECT l.lag,
           SUM(CAST(a.y AS HUGEINT) * b.y) AS nm,
           COUNT(*) AS n_pairs
    FROM lags l
    JOIN centered a ON TRUE
    JOIN centered b ON b.i = a.i + l.lag
    GROUP BY l.lag
)
SELECT CAST(num.lag AS INT) AS lag,
       CAST(num.n_pairs AS BIGINT) AS n_pairs,
       round(CAST(num.nm AS DOUBLE) / CAST(den.d AS DOUBLE), 6) AS acf
FROM num, den
ORDER BY lag
"""


@register("acf_lags_exact", oracle=ACF_SQL, covers=["A2", "O1", "J1"])
def q_acf_lags_exact(spark, sf_dir):
    """Exact sample autocorrelation of the daily-revenue series at lags
    1..7 (the seasonality detector behind weekly-pattern features).

    acf(l) = sum(y_t * y_{t+l}) / sum(y_t^2) with y_t = n*x_t - S: the
    n-scaled centering keeps every intermediate an exact integer (the
    1/n^2 factors cancel in the ratio); products run as DECIMAL(38,0)
    on Spark / HUGEINT on DuckDB, one correctly-rounded double division
    at the end. Day index = row_number over observed days (gaps skipped
    — the convention documented here and mirrored by the oracle).

    Scale: the daily series is |days| rows (~2.4k at any corpus size —
    aggregation output, not fact rows), so the lag self-join is a
    broadcast-sized spine; the only fact-table pass is the first keyed
    SUM, which combines map-side."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "cents"
    )
    tot = idx.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    centered = idx.crossJoin(F.broadcast(tot)).select(
        "i", (F.col("n").cast("long") * F.col("cents") - F.col("s")).alias("y")
    )
    den = centered.agg(
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")).alias("d")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = centered.select(F.col("i").alias("ai"), F.col("y").alias("ya"))
    b = centered.select(F.col("i").alias("bi"), F.col("y").alias("yb"))
    num = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("bi") == F.col("ai") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(
                F.col("ya").cast("decimal(19,0)") * F.col("yb").cast("decimal(19,0)")
            ).alias("nm"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                F.col("nm").cast("double") / F.col("d").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# 2. Theil–Sen robust slope of per-nation monthly revenue.

THEILSEN_SQL = """
WITH monthly AS (
    SELECT c.c_nationkey AS nation,
           (year(o.o_orderdate) - 1992) * 12 + month(o.o_orderdate) AS m,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey,
             (year(o.o_orderdate) - 1992) * 12 + month(o.o_orderdate)
),
pairs AS (
    SELECT a.nation,
           CAST(b.cents - a.cents AS DOUBLE)
               / CAST(b.m - a.m AS DOUBLE) AS slope,
           a.m AS mi, b.m AS mj
    FROM monthly a
    JOIN monthly b ON b.nation = a.nation AND b.m > a.m
),
ranked AS (
    SELECT nation, slope,
           row_number() OVER (PARTITION BY nation
                              ORDER BY slope, mi, mj) AS rn,
           COUNT(*) OVER (PARTITION BY nation) AS cnt
    FROM pairs
)
SELECT nation, CAST(cnt AS BIGINT) AS n_pairs,
       round(slope, 6) AS slope_cents_per_month
FROM ranked WHERE rn = (cnt + 1) // 2
ORDER BY nation
"""


@register("theil_sen_slope", oracle=THEILSEN_SQL, covers=["A2", "O6", "J1"])
def q_theil_sen_slope(spark, sf_dir):
    """Theil–Sen robust trend: per nation, the median over all month
    pairs (i < j) of (revenue_j - revenue_i) / (j - i) — the
    outlier-resistant alternative to the OLS slope (breaks down at 29%
    contamination instead of one bad point).

    Slopes are exact-integer differences divided once as doubles
    (bit-identical in both engines); the median is nearest-rank-lower
    over a TOTAL order (slope, mi, mj) so duplicate slope values cannot
    make the pick engine-specific.

    Scale: the pair join is per-nation quadratic over the MONTHLY
    aggregate (~80 rows/key -> ~3.2k pairs/key), constant in fact-table
    size; nations partition the work."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    monthly = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12 + F.month("o_orderdate")
            ).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    a = monthly.select(
        "nation", F.col("m").alias("mi"), F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("nation").alias("nation_b"),
        F.col("m").alias("mj"),
        F.col("cents").alias("cb"),
    )
    pairs = a.join(
        b, (F.col("nation_b") == F.col("nation")) & (F.col("mj") > F.col("mi"))
    ).select(
        "nation",
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("mj") - F.col("mi")).cast("double")
        ).alias("slope"),
        "mi",
        "mj",
    )
    w = Window.partitionBy("nation").orderBy("slope", "mi", "mj")
    ranked = pairs.select(
        "nation",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("nation")).alias("cnt"),
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(
            "nation",
            F.col("cnt").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_cents_per_month"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# 3. One-way ANOVA F statistic: events.value by event_type.

ANOVA_SQL = """
WITH v AS (
    SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events WHERE value IS NOT NULL
),
grp AS (
    SELECT event_type,
           COUNT(*) AS ni,
           SUM(v6) AS si,
           SUM(CAST(v6 AS HUGEINT) * v6) AS qi
    FROM v GROUP BY event_type
),
tot AS (
    SELECT COUNT(*) AS k, SUM(ni) AS n, SUM(si) AS s,
           SUM(qi) AS q
    FROM grp
),
terms AS (
    -- per-group s_i^2/n_i as doubles, folded in event_type order
    SELECT list_reduce(
               list(CAST(CAST(si AS HUGEINT) * si AS DOUBLE) / CAST(ni AS DOUBLE)
                    ORDER BY event_type),
               (x, y) -> x + y) AS sum_sq_over_n
    FROM grp
)
SELECT CAST(tot.k AS INT) AS k,
       CAST(tot.n AS BIGINT) AS n,
       round((terms.sum_sq_over_n
              - CAST(CAST(tot.s AS HUGEINT) * tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
             / 1e12, 6) AS ssb,
       round((CAST(tot.q AS DOUBLE) - terms.sum_sq_over_n) / 1e12, 6) AS ssw,
       round(((terms.sum_sq_over_n
               - CAST(CAST(tot.s AS HUGEINT) * tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
              / CAST(tot.k - 1 AS DOUBLE))
             / ((CAST(tot.q AS DOUBLE) - terms.sum_sq_over_n)
                / CAST(tot.n - tot.k AS DOUBLE)), 6) AS f_stat
FROM tot, terms
"""


@register("anova_f_oneway", oracle=ANOVA_SQL, covers=["A2", "F16"])
def q_anova_f_oneway(spark, sf_dir):
    """One-way ANOVA from exact sufficient statistics: F = (SSB/(k-1)) /
    (SSW/(N-k)) for events.value grouped by event_type — the screening
    test behind "does this segmentation matter at all".

    All sums (S_i, Q_i = sum v^2) are exact scaled integers (micros;
    squares in DECIMAL(38,0)/HUGEINT); the k per-group S_i^2/n_i terms
    are folded as doubles in event_type order — identical IEEE sequence
    in both engines (k is tiny; the fold is the label_centroids trick).
    SSB/SSW reported in original units (the 1e12 rescale of micros^2).

    Scale: one map-side-combinable aggregation over the fact table,
    then arithmetic on a k-row table. Nothing else."""
    from prosnet_prefect_pipelines_spark.model import read_events

    v = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
        )
    )
    grp = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("v6").alias("si"),
        F.sum(F.col("v6").cast("decimal(19,0)") * F.col("v6").cast("decimal(19,0)")).alias("qi"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi").alias("q"),
    )
    terms = grp.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type").alias("et"),
                        (
                            (
                                F.col("si").cast("decimal(19,0)")
                                * F.col("si").cast("decimal(19,0)")
                            ).cast("double")
                            / F.col("ni").cast("double")
                        ).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("term"),
        ).alias("sum_sq_over_n")
    )
    s2_over_n = (
        F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    ).cast("double") / F.col("n").cast("double")
    ssb = F.col("sum_sq_over_n") - s2_over_n
    ssw = F.col("q").cast("double") - F.col("sum_sq_over_n")
    return tot.crossJoin(F.broadcast(terms)).select(
        F.col("k").cast("int").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(ssb / F.lit(1e12), 6).alias("ssb"),
        F.round(ssw / F.lit(1e12), 6).alias("ssw"),
        F.round(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# 4. Cramér's V for two categorical pairs.

_CHI2_CTE = """
ev AS (
    SELECT event_type AS a,
           CAST((((epoch_us(ts) // 86400000000) + 3) % 7 + 7) % 7 + 1 AS BIGINT) AS b
    FROM events
),
op AS (
    SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders
),
cells AS (
    SELECT 'event_type_x_isodow' AS pair, a, CAST(b AS VARCHAR) AS b,
           COUNT(*) AS obs
    FROM ev GROUP BY a, b
    UNION ALL
    SELECT 'priority_x_status' AS pair, a, b, COUNT(*) AS obs
    FROM op GROUP BY a, b
),
margins AS (
    SELECT pair, a, b, obs,
           SUM(obs) OVER (PARTITION BY pair, a) AS r,
           SUM(obs) OVER (PARTITION BY pair, b) AS c,
           SUM(obs) OVER (PARTITION BY pair) AS n
    FROM cells
),
terms AS (
    SELECT pair,
           MAX(n) AS n,
           COUNT(DISTINCT a) AS nr,
           COUNT(DISTINCT b) AS nc,
           list_reduce(
               list((CAST(n * obs - r * c AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(n * obs - r * c AS DOUBLE) / CAST(r * c AS DOUBLE))
                    ORDER BY a, b),
               (x, y) -> x + y) AS chi2
    FROM margins GROUP BY pair
)
SELECT pair, CAST(n AS BIGINT) AS n, CAST(nr AS INT) AS n_rows,
       CAST(nc AS INT) AS n_cols, round(chi2, 6) AS chi2,
       round(sqrt(chi2 / (CAST(n AS DOUBLE)
                          * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6) AS cramers_v
FROM terms ORDER BY pair
"""

CRAMERS_SQL = f"WITH {_CHI2_CTE}"


@register("cramers_v_pairs", oracle=CRAMERS_SQL, covers=["A1", "A2", "O1"])
def q_cramers_v_pairs(spark, sf_dir):
    """Cramér's V association strength for two categorical pairs
    (event_type x ISO weekday; order priority x status) — the
    feature-redundancy screen run before one-hot-encoding a wide
    categorical table.

    chi2 cell terms use the exact-integer identity (N*obs - r*c)^2 /
    (N*r*c), factored as (d/N)*(d/(r*c)) so no intermediate leaves
    BIGINT range; the per-cell doubles fold in (a, b) order. ISO
    weekday comes from pure epoch-day arithmetic ((day+3)%7+1), immune
    to dayofweek convention drift. Observed-margin cells only (a zero
    observed cell contributes its expected mass via the margins of the
    cells that do exist — documented estimator choice, same in both
    engines).

    Scale: two fact-table keyed counts; everything after is cells-sized
    (tens of rows)."""
    from prosnet_prefect_pipelines_spark.model import read_events

    ev = read_events(spark, sf_dir).select(
        F.lit("event_type_x_isodow").alias("pair"),
        F.col("event_type").alias("a"),
        (
            # floor-division epoch day (trunc `div` would round toward zero
            # for pre-1970 timestamps and disagree with DuckDB's flooring
            # `//`); subtracting pmod first makes the quotient exact.
            F.pmod(
                F.expr(
                    "(ts_us - pmod(ts_us, 86400000000)) div 86400000000"
                ) + 3,
                F.lit(7),
            ) + 1
        ).cast("long").cast("string").alias("b"),
    )
    op = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.lit("priority_x_status").alias("pair"),
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    )
    cells = ev.unionByName(op).groupBy("pair", "a", "b").agg(
        F.count(F.lit(1)).alias("obs")
    )
    wp = Window.partitionBy("pair")
    margins = cells.select(
        "pair",
        "a",
        "b",
        "obs",
        F.sum("obs").over(Window.partitionBy("pair", "a")).alias("r"),
        F.sum("obs").over(Window.partitionBy("pair", "b")).alias("c"),
        F.sum("obs").over(wp).alias("n"),
    )
    d = F.col("n") * F.col("obs") - F.col("r") * F.col("c")
    term = (d.cast("double") / F.col("n").cast("double")) * (
        d.cast("double") / (F.col("r") * F.col("c")).cast("double")
    )
    terms = margins.select(
        "pair", "a", "b", "n", term.alias("term")
    ).groupBy("pair").agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("nr"),
        F.countDistinct("b").alias("nc"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("a", "b", F.col("term").alias("t")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("t"),
        ).alias("chi2"),
    )
    return terms.select(
        "pair",
        F.col("n").cast("long").alias("n"),
        F.col("nr").cast("int").alias("n_rows"),
        F.col("nc").cast("int").alias("n_cols"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    ).orderBy("pair")


# ---------------------------------------------------------------------------
# 5. Weight-of-evidence / information-value report.

WOE_SQL = """
WITH lab AS (
    SELECT o_orderpriority AS bucket,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
    FROM orders
),
grp AS (
    SELECT bucket,
           SUM(1 - bad) AS good_i,
           SUM(bad) AS bad_i
    FROM lab GROUP BY bucket
),
tot AS (SELECT SUM(good_i) AS g, SUM(bad_i) AS b FROM grp)
SELECT grp.bucket,
       CAST(grp.good_i AS BIGINT) AS good_i,
       CAST(grp.bad_i AS BIGINT) AS bad_i,
       round(CASE WHEN grp.good_i > 0 AND grp.bad_i > 0
                  THEN ln((CAST(grp.good_i AS DOUBLE) * CAST(tot.b AS DOUBLE))
                          / (CAST(grp.bad_i AS DOUBLE) * CAST(tot.g AS DOUBLE)))
             END, 6) AS woe,
       round(CASE WHEN grp.good_i > 0 AND grp.bad_i > 0
                  THEN (CAST(grp.good_i AS DOUBLE) / CAST(tot.g AS DOUBLE)
                        - CAST(grp.bad_i AS DOUBLE) / CAST(tot.b AS DOUBLE))
                       * ln((CAST(grp.good_i AS DOUBLE) * CAST(tot.b AS DOUBLE))
                            / (CAST(grp.bad_i AS DOUBLE) * CAST(tot.g AS DOUBLE)))
             END, 6) AS iv_term
FROM grp, tot
ORDER BY grp.bucket
"""


@register("woe_iv_report", oracle=WOE_SQL, covers=["A2", "P7"])
def q_woe_iv_report(spark, sf_dir):
    """Weight-of-evidence encoding + per-bucket information value for a
    binary target (order fell to status 'F') over priority buckets —
    the credit-scoring-style predictive-power screen for a categorical
    feature.

    woe = ln((good_i * B) / (bad_i * G)) evaluated as ONE double ratio
    of exact integer products (identical operand order both engines);
    buckets with a zero cell yield NULL (the standard undefined case)
    instead of +-inf. One keyed count over the fact table; everything
    else is bucket-sized."""
    lab = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    grp = lab.groupBy("bucket").agg(
        F.sum(1 - F.col("bad")).alias("good_i"),
        F.sum("bad").alias("bad_i"),
    )
    tot = grp.agg(F.sum("good_i").alias("g"), F.sum("bad_i").alias("b"))
    ratio = (F.col("good_i").cast("double") * F.col("b").cast("double")) / (
        F.col("bad_i").cast("double") * F.col("g").cast("double")
    )
    defined = (F.col("good_i") > 0) & (F.col("bad_i") > 0)
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("good_i").cast("long").alias("good_i"),
            F.col("bad_i").cast("long").alias("bad_i"),
            F.round(F.when(defined, F.log(ratio)), 6).alias("woe"),
            F.round(
                F.when(
                    defined,
                    (
                        F.col("good_i").cast("double") / F.col("g").cast("double")
                        - F.col("bad_i").cast("double") / F.col("b").cast("double")
                    )
                    * F.log(ratio),
                ),
                6,
            ).alias("iv_term"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# 6. Calibration (reliability) bins for a deterministic synthetic score.

CALIB_SQL = """
WITH scored AS (
    SELECT c_custkey,
           (c_custkey * 2654435761) % 1000000 AS p_ppm,
           CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
    FROM customer
),
bins AS (
    SELECT p_ppm // 100000 AS bin,
           COUNT(*) AS n,
           SUM(p_ppm) AS sum_ppm,
           SUM(y) AS pos
    FROM scored GROUP BY p_ppm // 100000
)
SELECT CAST(bin AS INT) AS bin,
       CAST(n AS BIGINT) AS n,
       round(CAST(sum_ppm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
           AS mean_pred,
       round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_rate,
       round(abs(CAST(sum_ppm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap
FROM bins ORDER BY bin
"""


@register("calibration_bins_report", oracle=CALIB_SQL, covers=["A2", "O1"])
def q_calibration_bins_report(spark, sf_dir):
    """Reliability diagram: decile bins of a deterministic synthetic
    score (Knuth-hash ppm of the customer key) against the observed
    positive rate (positive account balance) — the calibration audit
    run on every scored table before its scores are trusted.

    The score is integer ppm end-to-end; each bin reports mean
    predicted vs observed rate and the absolute calibration gap, all
    from exact integer sums with one final double division per column.
    One keyed aggregation; ten output rows."""
    scored = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        ((F.col("c_custkey") * F.lit(2654435761)) % 1_000_000).alias("p_ppm"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(
        F.expr("p_ppm div 100000").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_ppm").alias("sum_ppm"),
        F.sum("y").alias("pos"),
    )
    mean_pred = F.col("sum_ppm").cast("double") / F.col("n").cast("double") / F.lit(
        1_000_000.0
    )
    obs_rate = F.col("pos").cast("double") / F.col("n").cast("double")
    return bins.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.round(mean_pred, 6).alias("mean_pred"),
        F.round(obs_rate, 6).alias("obs_rate"),
        F.round(F.abs(mean_pred - obs_rate), 6).alias("gap"),
    ).orderBy("bin")
