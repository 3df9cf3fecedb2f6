"""Pipeline batch 98 (north-star extension): agreement & 2x2
epidemiology statistics — McNemar's paired test, Cohen's kappa,
per-stratum odds/risk ratios, Mantel–Haenszel pooled odds ratio, the
Wald–Wolfowitz runs test, and the Durbin–Watson statistic, all with
the catalog's exact-integer discipline so Spark and DuckDB agree
bit-for-bit.

Exactness conventions (continuing batches 95-97; see catalog.py):
- every contingency count is an exact BIGINT from one keyed
  aggregation; each statistic does its double division in ONE fixed
  expression shape shared verbatim with the oracle;
- Cohen's kappa stays a SINGLE division of two exact integers via
  kappa = (n(a+d) - pe_num) / (n^2 - pe_num);
- Durbin–Watson uses mean-scaled residuals e_t = n*x_t - S (exact
  BIGINTs): the n^2 scale cancels between numerator and denominator,
  so DW = sum(n*(x_t-x_{t-1}))^2 / sum(e_t^2) is exact until one
  final division (DECIMAL(38,0)/HUGEINT products);
- the K-stratum Mantel–Haenszel double terms fold in stratum-key
  order (F.aggregate(array_sort(collect_list)) == list_reduce(list(
  ... ORDER BY ...))).

Scale notes: 2x2/stratified statistics aggregate fact rows once and
compute on <= K-row cell tables; the two sequence statistics (runs,
DW) window over the DAILY series (|days| rows, ~2.4k over the 7-year
span — documented as the one unpartitioned-but-tiny window each).

Ref semantics: SURVEY §2 A2/J1/O1 compositions; no reference
counterpart (extensions X-MCNEMAR .. X-DURBINWATSON).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# threshold (cents) splitting "high" from "low" yearly customer spend /
# order value — a fixed semantic constant, not data-derived, so the
# query stays one aggregation pass at any scale
_HI_CENTS = 15_000_000

# ---------------------------------------------------------------------------
# 1. McNemar's test: high-spend flag flips between 1995 and 1996.

MCNEMAR_SQL = f"""
WITH yr AS (
    SELECT o_custkey AS k, EXTRACT(year FROM o_orderdate) AS y,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2
),
pairs AS (
    SELECT CASE WHEN a.cents > {_HI_CENTS} THEN 1 ELSE 0 END AS f95,
           CASE WHEN b.cents > {_HI_CENTS} THEN 1 ELSE 0 END AS f96
    FROM yr a JOIN yr b ON a.k = b.k AND a.y = 1995 AND b.y = 1996
),
cells AS (
    SELECT SUM(CASE WHEN f95 = 1 AND f96 = 1 THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN f95 = 1 AND f96 = 0 THEN 1 ELSE 0 END) AS b,
           SUM(CASE WHEN f95 = 0 AND f96 = 1 THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN f95 = 0 AND f96 = 0 THEN 1 ELSE 0 END) AS d
    FROM pairs
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE), 6)
           AS chi2
FROM cells
"""


@register("mcnemar_paired_flips", oracle=MCNEMAR_SQL, covers=["A2", "J1"])
def q_mcnemar_paired_flips(spark, sf_dir):
    """McNemar's test for marginal homogeneity of the high-spend flag
    across the 1995/1996 customer pair: chi2 = (b-c)^2/(b+c) on the
    discordant counts — did the share of high spenders change?

    One keyed pair join (per-customer aggregates, broadcastable), one
    2x2 cell aggregation; b, c exact BIGINTs, one double division.

    Ref semantics: SURVEY §2 A2/J1 (extension X-MCNEMAR)."""
    yr = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("y", F.year("o_orderdate"))
        .filter(F.col("y").isin(1995, 1996))
        .groupBy(F.col("o_custkey").alias("k"), "y")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .withColumn("f", (F.col("cents") > _HI_CENTS).cast("int"))
    )
    a = yr.filter(F.col("y") == 1995).select("k", F.col("f").alias("f95"))
    b = yr.filter(F.col("y") == 1996).select("k", F.col("f").alias("f96"))
    pairs = a.join(b, on="k")
    cells = pairs.agg(
        F.sum(((F.col("f95") == 1) & (F.col("f96") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("f95") == 1) & (F.col("f96") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("f95") == 0) & (F.col("f96") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("f95") == 0) & (F.col("f96") == 0)).cast("long")).alias("d"),
    )
    diff = F.col("b") - F.col("c")
    return cells.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(
            (diff * diff).cast("double") / (F.col("b") + F.col("c")).cast("double"),
            6,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# 2. Cohen's kappa: urgency label vs high-value label.

KAPPA_SQL = f"""
WITH v AS (
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS ra,
           CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) > {_HI_CENTS}
               THEN 1 ELSE 0 END AS rb
    FROM orders
),
cells AS (
    SELECT SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS b,
           SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS d,
           COUNT(*) AS n
    FROM v
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(CAST(n * (a + d)
                  - ((a + b) * (a + c) + (c + d) * (b + d)) AS DOUBLE)
             / CAST(n * n
                    - ((a + b) * (a + c) + (c + d) * (b + d)) AS DOUBLE), 6)
           AS kappa
FROM cells
"""


@register("cohens_kappa_labels", oracle=KAPPA_SQL, covers=["A2"])
def q_cohens_kappa_labels(spark, sf_dir):
    """Cohen's kappa between two derived binary raters (priority-is-
    high vs value-is-high): kappa = (po - pe)/(1 - pe) computed as the
    SINGLE exact-integer division (n(a+d) - pe_num)/(n^2 - pe_num)
    with pe_num = (a+b)(a+c) + (c+d)(b+d) — no intermediate float
    probabilities.

    One narrow aggregation over orders; the 2x2 products stay in
    BIGINT (n <= 3e9 before pe_num risks int64 — documented bound,
    DECIMAL route available beyond).

    Ref semantics: SURVEY §2 A2 (extension X-KAPPA)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("ra"),
        (F.round(F.col("o_totalprice") * 100).cast("long") > _HI_CENTS)
        .cast("int")
        .alias("rb"),
    )
    cells = v.agg(
        F.sum(((F.col("ra") == 1) & (F.col("rb") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("ra") == 1) & (F.col("rb") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("ra") == 0) & (F.col("rb") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("ra") == 0) & (F.col("rb") == 0)).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    pe_num = (F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) + (
        F.col("c") + F.col("d")
    ) * (F.col("b") + F.col("d"))
    return cells.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(
            (F.col("n") * (F.col("a") + F.col("d")) - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double"),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# 3. Per-region odds & risk ratios: urgency -> order fell through.

ODDS_SQL = """
WITH v AS (
    SELECT r.r_name AS region,
           CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS exposed,
           CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS outcome
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
),
cells AS (
    SELECT region,
           SUM(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END) AS b,
           SUM(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END) AS d
    FROM v GROUP BY region
)
SELECT region,
       CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
           AS odds_ratio,
       round((CAST(a AS DOUBLE) / (a + b))
             / (CAST(c AS DOUBLE) / (c + d)), 6) AS risk_ratio
FROM cells
ORDER BY region
"""


@register("odds_risk_by_region", oracle=ODDS_SQL, covers=["A2", "J1", "O1"])
def q_odds_risk_by_region(spark, sf_dir):
    """Per-region 2x2 association of high priority with unfinished
    status: odds ratio ad/bc and risk ratio (a/(a+b))/(c/(c+d)), cell
    counts exact, each ratio one fixed double expression.

    Dimension joins broadcast; one keyed aggregation to a 5-row cell
    table.

    Ref semantics: SURVEY §2 A2/J1/O1 (extension X-ODDSRATIO)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("region"))
    )
    v = orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey).select(
        "region",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("exposed"),
        (F.col("o_orderstatus") == "F").cast("int").alias("outcome"),
    )
    cells = v.groupBy("region").agg(
        F.sum(((F.col("exposed") == 1) & (F.col("outcome") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("exposed") == 1) & (F.col("outcome") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("exposed") == 0) & (F.col("outcome") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("exposed") == 0) & (F.col("outcome") == 0)).cast("long")).alias("d"),
    )
    return cells.select(
        "region",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(
            F.col("a").cast("double") * F.col("d")
            / (F.col("b").cast("double") * F.col("c")),
            6,
        ).alias("odds_ratio"),
        F.round(
            (F.col("a").cast("double") / (F.col("a") + F.col("b")))
            / (F.col("c").cast("double") / (F.col("c") + F.col("d"))),
            6,
        ).alias("risk_ratio"),
    ).orderBy("region")


# ---------------------------------------------------------------------------
# 4. Mantel–Haenszel pooled odds ratio across region strata.

MH_SQL = """
WITH v AS (
    SELECT r.r_name AS region,
           CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS exposed,
           CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS outcome
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
),
cells AS (
    SELECT region,
           SUM(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END) AS b,
           SUM(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END) AS d
    FROM v GROUP BY region
),
folds AS (
    SELECT COUNT(*) AS k,
           list_reduce(
               list(CAST(a AS DOUBLE) * d / (a + b + c + d)
                    ORDER BY region), (x, y) -> x + y) AS num,
           list_reduce(
               list(CAST(b AS DOUBLE) * c / (a + b + c + d)
                    ORDER BY region), (x, y) -> x + y) AS den
    FROM cells
)
SELECT CAST(k AS INT) AS k,
       round(num, 6) AS mh_num,
       round(den, 6) AS mh_den,
       round(num / den, 6) AS or_mh
FROM folds
"""


@register("mantel_haenszel_or", oracle=MH_SQL, covers=["A2", "J1"])
def q_mantel_haenszel_or(spark, sf_dir):
    """Mantel–Haenszel pooled odds ratio across region strata:
    OR_MH = sum_i(a_i d_i / n_i) / sum_i(b_i c_i / n_i) — the
    confounder-adjusted association the per-stratum odds ratios
    marginalize over.

    The K per-stratum double terms fold in region order (identical
    IEEE sequence both engines); cell counts exact.

    Ref semantics: SURVEY §2 A2/J1 (extension X-MANTELH)."""
    # the cell table shares its shape with odds_risk_by_region but is
    # rebuilt here so each query's plan stands alone
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("region"))
    )
    v = orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey).select(
        "region",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("exposed"),
        (F.col("o_orderstatus") == "F").cast("int").alias("outcome"),
    )
    cells = v.groupBy("region").agg(
        F.sum(((F.col("exposed") == 1) & (F.col("outcome") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("exposed") == 1) & (F.col("outcome") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("exposed") == 0) & (F.col("outcome") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("exposed") == 0) & (F.col("outcome") == 0)).cast("long")).alias("d"),
    )
    nsum = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    folds = cells.agg(
        F.count(F.lit(1)).alias("k"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("region").alias("region"),
                        (F.col("a").cast("double") * F.col("d") / nsum).alias(
                            "t"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("t"),
        ).alias("num"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("region").alias("region"),
                        (F.col("b").cast("double") * F.col("c") / nsum).alias(
                            "t"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("t"),
        ).alias("den"),
    )
    return folds.select(
        F.col("k").cast("int").alias("k"),
        F.round(F.col("num"), 6).alias("mh_num"),
        F.round(F.col("den"), 6).alias("mh_den"),
        F.round(F.col("num") / F.col("den"), 6).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# 5. Wald–Wolfowitz runs test on daily order-count changes.

RUNS_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
    FROM orders GROUP BY 1
),
diffs AS (
    SELECT day, cnt - lag(cnt) OVER (ORDER BY day) AS d FROM daily
),
signs AS (
    SELECT day, CASE WHEN d > 0 THEN 1 ELSE 0 END AS s
    FROM diffs WHERE d IS NOT NULL AND d <> 0
),
runs AS (
    SELECT s,
           CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                     OR lag(s) OVER (ORDER BY day) <> s
               THEN 1 ELSE 0 END AS new_run
    FROM signs
),
agg AS (
    SELECT SUM(new_run) AS r, SUM(s) AS n1, COUNT(*) - SUM(s) AS n2
    FROM runs
)
SELECT CAST(r AS BIGINT) AS runs, CAST(n1 AS BIGINT) AS n_plus,
       CAST(n2 AS BIGINT) AS n_minus,
       round((CAST(r AS DOUBLE)
              - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                       * (n1 + n2 - 1))), 6) AS z
FROM agg
"""


@register("runs_test_daily", oracle=RUNS_SQL, covers=["A2", "O1", "T1"])
def q_runs_test_daily(spark, sf_dir):
    """Wald–Wolfowitz runs test for randomness of the up/down sign
    sequence of daily order counts: R runs among n+ rises and n-
    falls, z = (R - (2 n+ n-/N + 1)) / sqrt(2 n+ n- (2 n+ n- - N) /
    (N^2 (N-1))).

    Zero-diff days drop (classic tie handling). The lag/run windows
    order the DAILY series (~2.4k rows over the 7-year span) — the
    documented tiny unpartitioned window; counts exact, z one shared
    double expression.

    Ref semantics: SURVEY §2 A2/O1/T1 (extension X-RUNSTEST)."""
    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("day")
    diffs = daily.withColumn("d", F.col("cnt") - F.lag("cnt").over(w))
    signs = diffs.filter(F.col("d").isNotNull() & (F.col("d") != 0)).select(
        "day", (F.col("d") > 0).cast("int").alias("s")
    )
    runs = signs.withColumn(
        "new_run",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")), 1
        ).otherwise(0),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("s").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    z = (
        F.col("r").cast("double") - (F.lit(2.0) * n1 * n2 / nn + F.lit(1.0))
    ) / F.sqrt(
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (nn.cast("double") * nn * (nn - 1))
    )
    return agg.select(
        F.col("r").cast("long").alias("runs"),
        n1.cast("long").alias("n_plus"),
        n2.cast("long").alias("n_minus"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# 6. Durbin–Watson statistic of the daily revenue series.

DW_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
    FROM orders GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM daily),
resid AS (
    SELECT day, tot.n * CAST(x AS HUGEINT) - tot.s AS e,
           tot.n * CAST(x - lag(x) OVER (ORDER BY day) AS HUGEINT) AS de
    FROM daily, tot
),
agg AS (
    SELECT SUM(de * de) AS num, SUM(e * e) AS den, COUNT(*) AS n
    FROM resid
)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw
FROM agg
"""


@register("durbin_watson_daily", oracle=DW_SQL, covers=["A2", "T1"])
def q_durbin_watson_daily(spark, sf_dir):
    """Durbin–Watson first-order autocorrelation statistic of daily
    revenue around its mean: DW = sum(e_t - e_{t-1})^2 / sum(e_t^2)
    with mean-scaled residuals e_t = n*x_t - S — exact BIGINT-derived
    DECIMALs whose common n^2 factor cancels, so the statistic is
    exact until ONE final double division.

    The lag window orders the daily series (~2.4k rows); products
    route through DECIMAL(38,0)/HUGEINT (n*x ~ 1e13 cents-days at
    sf1, squared ~ 1e26 — inside 38 digits through sf1000).

    Ref semantics: SURVEY §2 A2/T1 (extension X-DURBINWATSON)."""
    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
    )
    w = Window.orderBy("day")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    resid = (
        daily.withColumn("xlag", F.lag("x").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("n") * dec(F.col("x")) - F.col("s")).alias("e"),
            (F.col("n") * dec(F.col("x") - F.col("xlag"))).alias("de"),
        )
    )
    agg = resid.agg(
        F.sum(F.col("de") * F.col("de")).alias("num"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("dw"),
    )
