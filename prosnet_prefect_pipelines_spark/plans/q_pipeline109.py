"""Pipeline batch 109 (north-star extension): sequential testing &
forecast baselines — Wald's SPRT over the monthly return-rate
series, a Page-Hinkley change alarm on monthly revenue, per-region
Beta-Binomial posterior summaries, and the naive/seasonal-naive
forecast-error panel (MAE / RMSE / MASE).

Exactness conventions:
- SPRT log-likelihood increments are 6-dp LITERALS (the test is
  p0 = 0.45 vs p1 = 0.55, so ln(p1/p0) = +0.200671 and
  ln((1-p1)/(1-p0)) = -0.200671; Wald thresholds ln(19) = 2.944439):
  LLR_m = 0.200671 * (2*k_m - n_m) — one literal times an exact
  integer, zero cross-engine libm exposure;
- Page-Hinkley uses the global-mean scaled-deviation trick: the
  statistic n*CumS_t - t*S is an exact integer (HUGEINT /
  DECIMAL(38,0)), the running minimum is an integer window, and the
  excursion only becomes a double at the final /n;
- Beta(1+k, 1+n-k) posterior mean/variance are exact integer
  rationals divided once;
- MASE = MAE(naive) ratios of exact integer absolute errors.

Scale notes: one narrow month-keyed (or region-keyed) aggregation
over orders/lineitem carries all fact-table work; every recurrence
and window then runs on the CALENDAR-BOUNDED monthly series (80
rows) or the 5-row region table — the batch-103 invariant.

Ref semantics: SURVEY §2 A2/F16/O1 compositions; no reference
counterpart (extensions X-SPRT .. X-MASE).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# SPRT literals: H0 p=0.45, H1 p=0.55, alpha = beta = 0.05
_LLR_INC = 0.200671     # ln(0.55/0.45), 6 dp
_WALD_A = 2.944439      # ln((1-beta)/alpha) = ln(19)
_WALD_B = -2.944439

# monthly return-rate series: per month, orders and returned orders
_MONTHLY_RET_SQL = """
per_order AS (
    SELECT o.o_orderkey,
           CAST(EXTRACT(year FROM o.o_orderdate) * 12
                + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS m,
           MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
monthly AS (
    SELECT m, COUNT(*) AS n, SUM(ret) AS k FROM per_order GROUP BY m
)
"""


def _monthly_ret(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "m")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ret").alias("k"))
    )


# ---------------------------------------------------------------------------
# 1. Wald SPRT decision over cumulative months.

SPRT_SQL = (
    "WITH "
    + _MONTHLY_RET_SQL
    + f""",
cum AS (
    SELECT m,
           SUM(n) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cn,
           SUM(k) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS ck
    FROM monthly
),
llr AS (
    SELECT m, cn, ck,
           {_LLR_INC} * (2 * CAST(ck AS DOUBLE) - cn) AS llr
    FROM cum
),
crossing AS (
    SELECT MIN(CASE WHEN llr >= {_WALD_A} OR llr <= {_WALD_B}
                    THEN m END) AS dm
    FROM llr
),
final AS (
    SELECT MAX(m) AS last_m FROM llr
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM llr) AS n_months,
       CAST(COALESCE(dm, (SELECT last_m FROM final)) AS BIGINT)
           AS decision_month_key,
       CASE WHEN dm IS NULL THEN 'continue'
            WHEN (SELECT llr FROM llr WHERE m = dm) >= {_WALD_A}
                THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       round((SELECT llr FROM llr
              WHERE m = COALESCE(dm, (SELECT last_m FROM final))), 6)
           AS llr_at_decision_6
FROM crossing
"""
)


@register("sprt_monthly_decision", oracle=SPRT_SQL, covers=["A2", "F16", "O1"])
def q_sprt_monthly_decision(spark, sf_dir):
    """Wald's sequential probability-ratio test of the order return
    rate (H0 p=0.45 vs H1 p=0.55, alpha=beta=0.05) run over
    cumulative months: LLR_m = 0.200671*(2k_m - n_m) with 6-dp
    literal increments and ln(19) thresholds; reports the first
    crossing month and the decision. All windows run on the
    calendar-bounded monthly series.

    Ref semantics: SURVEY §2 A2/F16 (extension X-SPRT)."""
    monthly = _monthly_ret(spark, sf_dir)
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    cum = monthly.select(
        F.col("m"),
        F.sum("n").over(w).alias("cn"),
        F.sum("k").over(w).alias("ck"),
    )
    llr = cum.withColumn(
        "llr",
        F.lit(_LLR_INC) * (2 * F.col("ck").cast("double") - F.col("cn")),
    )
    crossed = F.when(
        (F.col("llr") >= _WALD_A) | (F.col("llr") <= _WALD_B), F.col("m")
    )
    agg = llr.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.min(crossed).alias("dm"),
        F.max("m").alias("last_m"),
    )
    pick = F.coalesce(F.col("dm"), F.col("last_m"))
    at = (
        agg.join(
            F.broadcast(llr.select(F.col("m").alias("pm"), F.col("llr"))),
            pick == F.col("pm"),
        )
    )
    return at.select(
        F.col("n_months").cast("long").alias("n_months"),
        pick.cast("long").alias("decision_month_key"),
        F.when(F.col("dm").isNull(), F.lit("continue"))
        .when(F.col("llr") >= _WALD_A, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        F.round(F.col("llr"), 6).alias("llr_at_decision_6"),
    )


# ---------------------------------------------------------------------------
# 2. Page-Hinkley change alarm on monthly revenue (scaled integers).

_PH_LAMBDA_CENTS = 500000  # alarm threshold: 5,000 dollars of mean excursion

PAGE_HINKLEY_SQL = f"""
WITH m AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                + EXTRACT(month FROM o_orderdate) AS BIGINT) AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM m),
dev AS (
    SELECT k,
           SUM(CAST(x AS HUGEINT) * n) OVER (ORDER BY k ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (ORDER BY k) * s AS mt
    FROM m CROSS JOIN tot
),
runmin AS (
    SELECT k, mt,
           MIN(mt) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS mn
    FROM dev
),
exc AS (SELECT k, mt - mn AS e FROM runmin),
best AS (SELECT e, k FROM exc ORDER BY e DESC, k ASC LIMIT 1)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_months,
       CAST(best.k AS BIGINT) AS peak_month_key,
       round(CAST(best.e AS DOUBLE) / (SELECT n FROM tot) / 100.0, 6)
           AS max_excursion_dollars_6,
       (CAST(best.e AS DOUBLE) / (SELECT n FROM tot))
           > {_PH_LAMBDA_CENTS}.0 AS alarm
FROM best
"""


@register("page_hinkley_monthly", oracle=PAGE_HINKLEY_SQL, covers=["A2", "O1", "O6"])
def q_page_hinkley_monthly(spark, sf_dir):
    """Page-Hinkley upward-change alarm on monthly revenue with the
    global-mean scaled-deviation trick: m_t = n*CumS_t - t*S is an
    exact integer, the excursion m_t - min(m_<=t) stays integer, and
    only the final /n (and /100 to dollars) is floating. Alarm fires
    when the mean excursion exceeds 5,000 dollars. Calendar-bounded
    windows only.

    Ref semantics: SURVEY §2 A2/O1/O6 (extension X-PAGEHINKLEY)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = (
        o.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("k")
        .agg(F.sum(dec(F.col("c"))).cast("long").alias("x"))
    )
    tot = m.agg(F.count(F.lit(1)).alias("n"), F.sum(dec(F.col("x"))).alias("s"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("k")
    dev = m.crossJoin(F.broadcast(tot)).select(
        F.col("k"),
        F.col("n"),
        (
            F.sum(dec(F.col("x")) * F.col("n")).over(w)
            - F.row_number().over(wr) * F.col("s")
        ).alias("mt"),
    )
    runmin = dev.withColumn("mn", F.min("mt").over(w))
    exc = runmin.select(
        F.col("k"), F.col("n"), (F.col("mt") - F.col("mn")).alias("e")
    )
    best = exc.agg(
        F.max("n").alias("n"),
        F.max(F.struct(F.col("e"), (-F.col("k")).alias("nk"))).alias("b"),
    )
    mean_exc = F.col("b.e").cast("double") / F.col("n")
    return best.select(
        F.col("n").cast("long").alias("n_months"),
        (-F.col("b.nk")).cast("long").alias("peak_month_key"),
        F.round(mean_exc / 100.0, 6).alias("max_excursion_dollars_6"),
        (mean_exc > float(_PH_LAMBDA_CENTS)).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# 3. Beta-Binomial posterior summaries per region.

BETA_BINOMIAL_SQL = """
WITH per_order AS (
    SELECT o.o_orderkey, r.r_name AS grp,
           MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
g AS (SELECT grp, COUNT(*) AS n, SUM(ret) AS k FROM per_order GROUP BY grp)
SELECT grp, CAST(n AS BIGINT) AS n_orders, CAST(k AS BIGINT) AS k_returned,
       round(CAST(k AS DOUBLE) / n, 6) AS mle_6,
       round(CAST(k + 1 AS DOUBLE) / (n + 2), 6) AS posterior_mean_6,
       round(CAST(CAST(k + 1 AS HUGEINT) * (n - k + 1) AS DOUBLE)
             / (CAST(n + 2 AS DOUBLE) * (n + 2) * (n + 3)), 6)
           AS posterior_var_6,
       round(CAST(k + 1 AS DOUBLE) / (n + 2) - CAST(k AS DOUBLE) / n, 6)
           AS shrinkage_6
FROM g
"""


@register("beta_binomial_by_region", oracle=BETA_BINOMIAL_SQL, covers=["J1", "A2"])
def q_beta_binomial_by_region(spark, sf_dir):
    """Beta(1,1)-prior Binomial posterior of the return rate per
    region: posterior mean (k+1)/(n+2), exact-rational posterior
    variance (k+1)(n-k+1)/((n+2)^2(n+3)) and the shrinkage vs the
    MLE — the uniform-prior Laplace smoothing every rate report
    should ship with. Dims broadcast, 5-row output.

    Ref semantics: SURVEY §2 J1/A2 (extension X-BETABIN)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    r = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey"), F.col("r_name").alias("grp"))
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ret").alias("k"))
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    return g.select(
        F.col("grp"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("k").cast("long").alias("k_returned"),
        F.round(kd / nd, 6).alias("mle_6"),
        F.round((kd + 1) / (nd + 2), 6).alias("posterior_mean_6"),
        F.round(
            (dec(F.col("k") + 1) * (F.col("n") - F.col("k") + 1)).cast(
                "double"
            )
            / ((nd + 2) * (nd + 2) * (nd + 3)),
            6,
        ).alias("posterior_var_6"),
        F.round((kd + 1) / (nd + 2) - kd / nd, 6).alias("shrinkage_6"),
    )


# ---------------------------------------------------------------------------
# 4. Naive / seasonal-naive forecast-error panel (MAE, RMSE, MASE).

MASE_SQL = """
WITH m AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                + EXTRACT(month FROM o_orderdate) AS BIGINT) AS k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
lagged AS (
    SELECT k, x,
           LAG(x, 1) OVER (ORDER BY k) AS naive,
           LAG(x, 12) OVER (ORDER BY k) AS snaive
    FROM m
),
err AS (
    SELECT COUNT(naive) AS n1,
           SUM(CAST(abs(x - naive) AS HUGEINT)) AS ae1,
           SUM(CAST(abs(x - naive) AS HUGEINT) * abs(x - naive)) AS se1,
           COUNT(snaive) AS n12,
           SUM(CAST(abs(x - snaive) AS HUGEINT)) AS ae12
    FROM lagged
)
SELECT CAST(n1 AS BIGINT) AS n_naive, CAST(n12 AS BIGINT) AS n_seasonal,
       round(CAST(ae1 AS DOUBLE) / n1 / 100.0, 6) AS naive_mae_dollars_6,
       round(sqrt(CAST(se1 AS DOUBLE) / n1) / 100.0, 6)
           AS naive_rmse_dollars_6,
       round(CAST(ae12 AS DOUBLE) / n12 / 100.0, 6)
           AS seasonal_mae_dollars_6,
       round((CAST(ae12 AS DOUBLE) / n12) / (CAST(ae1 AS DOUBLE) / n1), 6)
           AS seasonal_vs_naive_mase_6
FROM err
"""


@register("forecast_error_mase", oracle=MASE_SQL, covers=["A2", "O1"])
def q_forecast_error_mase(spark, sf_dir):
    """The forecast-baseline error panel on monthly revenue: MAE and
    RMSE of the one-step naive forecast (lag 1) and the MAE of the
    seasonal-naive forecast (lag 12), plus their MASE-style ratio —
    the denominators every real forecasting model must beat. Absolute
    errors are exact integers; one double division per metric.

    Ref semantics: SURVEY §2 A2/O1 (extension X-MASE)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = (
        o.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("k")
        .agg(F.sum(dec(F.col("c"))).cast("long").alias("x"))
    )
    w = Window.orderBy("k")
    lagged = m.select(
        F.col("x"),
        F.lag("x", 1).over(w).alias("naive"),
        F.lag("x", 12).over(w).alias("snaive"),
    )
    ae1 = F.abs(F.col("x") - F.col("naive"))
    ae12 = F.abs(F.col("x") - F.col("snaive"))
    err = lagged.agg(
        F.count("naive").alias("n1"),
        F.sum(dec(ae1)).alias("ae1"),
        F.sum(dec(ae1) * ae1).alias("se1"),
        F.count("snaive").alias("n12"),
        F.sum(dec(ae12)).alias("ae12"),
    )
    mae1 = F.col("ae1").cast("double") / F.col("n1")
    mae12 = F.col("ae12").cast("double") / F.col("n12")
    return err.select(
        F.col("n1").cast("long").alias("n_naive"),
        F.col("n12").cast("long").alias("n_seasonal"),
        F.round(mae1 / 100.0, 6).alias("naive_mae_dollars_6"),
        F.round(
            F.sqrt(F.col("se1").cast("double") / F.col("n1")) / 100.0, 6
        ).alias("naive_rmse_dollars_6"),
        F.round(mae12 / 100.0, 6).alias("seasonal_mae_dollars_6"),
        F.round(mae12 / mae1, 6).alias("seasonal_vs_naive_mase_6"),
    )
