"""Pipeline batch 104 (north-star extension): fairness & inequality
auditing — the group-wise bias screens a training-data pipeline runs
before shipping a model or a labeled corpus: demographic parity,
equalized odds, predictive parity, the 80%% disparate-impact rule,
Theil inequality decomposition and per-group two-proportion z-tests.

The audited "classifier" is deterministic and data-derived: an order
is PREDICTED positive when any lineitem carries a deep discount
(l_discount > 0.05) and OBSERVED positive when any lineitem was
returned (l_returnflag = 'R'); the protected grouping is the
customer's region. This exercises the realistic audit shape — two
fact tables joined on their shared key, dimensions broadcast, then
per-group confusion cells.

Exactness conventions (the batch-95/99 discipline):
- every confusion cell / population count is an exact BIGINT;
- rates and ratios divide exact integers as doubles once, rounded to
  6 dp (NULLIF-guarded empty denominators on BOTH engines);
- Theil terms (x/S)*ln(x*n/S) round to 9 dp and sum as scaled
  BIGINT nano-units (the char_entropy_filter discipline at finer
  grain, since each term is O(1/n)).

Scale notes: the orders-lineitem join keys on l_orderkey (the
natural co-partitioning key at cluster scale); customer, nation and
region are broadcast dims. Every query then aggregates to at most
|regions| groups — the per-group tables are 5 rows. The Theil
decomposition's only data-sized pass is the per-customer spend
aggregation (map-side combinable).

Ref semantics: SURVEY §2 J1/A2 compositions; no reference
counterpart (extensions X-DEMPARITY .. X-RATEZTEST).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# orders labeled with prediction (deep discount) and outcome
# (any return), grouped by the customer's region
_BASE_CTE = """
base AS (
    SELECT o.o_orderkey AS okey, r.r_name AS grp,
           MAX(CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END) AS pred,
           MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS outc
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
)
"""

_CELLS_CTE = (
    _BASE_CTE
    + """,
cells AS (
    SELECT grp,
           COUNT(*) AS n,
           SUM(CASE WHEN pred = 1 AND outc = 1 THEN 1 ELSE 0 END) AS tp,
           SUM(CASE WHEN pred = 1 AND outc = 0 THEN 1 ELSE 0 END) AS fp,
           SUM(CASE WHEN pred = 0 AND outc = 1 THEN 1 ELSE 0 END) AS fn,
           SUM(CASE WHEN pred = 0 AND outc = 0 THEN 1 ELSE 0 END) AS tn
    FROM base GROUP BY grp
)
"""
)


def _base(spark, sf_dir):
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
        "l_orderkey", "l_discount", "l_returnflag"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey").alias("okey"), F.col("r_name").alias("grp"))
        .agg(
            F.max((F.col("l_discount") > 0.05).cast("int")).alias("pred"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("outc"),
        )
    )


def _cells(spark, sf_dir):
    b = _base(spark, sf_dir)
    flag = lambda p, o: F.sum(  # noqa: E731
        ((F.col("pred") == p) & (F.col("outc") == o)).cast("int")
    )
    return b.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        flag(1, 1).alias("tp"),
        flag(1, 0).alias("fp"),
        flag(0, 1).alias("fn"),
        flag(0, 0).alias("tn"),
    )


# ---------------------------------------------------------------------------
# 1. Demographic parity: per-group positive-prediction rate + DI ratio.

DEM_PARITY_SQL = (
    "WITH "
    + _BASE_CTE
    + """,
g AS (
    SELECT grp, COUNT(*) AS n, SUM(pred) AS pos FROM base GROUP BY grp
),
mx AS (SELECT MAX(CAST(pos AS DOUBLE) / n) AS max_rate FROM g)
SELECT grp, CAST(n AS BIGINT) AS n_orders, CAST(pos AS BIGINT) AS n_positive,
       round(CAST(pos AS DOUBLE) / n, 6) AS pos_rate_6,
       round(CAST(pos AS DOUBLE) / n / max_rate, 6) AS di_ratio_6
FROM g CROSS JOIN mx
"""
)


@register("demographic_parity_report", oracle=DEM_PARITY_SQL, covers=["J1", "A2"])
def q_demographic_parity_report(spark, sf_dir):
    """Demographic parity audit: per region, the positive-prediction
    rate of the deep-discount classifier and its ratio to the most
    favored group (the disparate-impact ratio). Exact counts; one
    double division per rate.

    Ref semantics: SURVEY §2 J1/A2 (extension X-DEMPARITY)."""
    b = _base(spark, sf_dir)
    g = b.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pred").alias("pos")
    )
    rate = F.col("pos").cast("double") / F.col("n")
    mx = g.agg(F.max(rate).alias("max_rate"))
    return g.crossJoin(F.broadcast(mx)).select(
        F.col("grp"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("pos").cast("long").alias("n_positive"),
        F.round(rate, 6).alias("pos_rate_6"),
        F.round(rate / F.col("max_rate"), 6).alias("di_ratio_6"),
    )


# ---------------------------------------------------------------------------
# 2. Equalized odds: per-group TPR / FPR.

EQ_ODDS_SQL = (
    "WITH "
    + _CELLS_CTE
    + """
SELECT grp,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       round(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS tpr_6,
       round(CAST(fp AS DOUBLE) / NULLIF(fp + tn, 0), 6) AS fpr_6
FROM cells
"""
)


@register("equalized_odds_report", oracle=EQ_ODDS_SQL, covers=["J1", "A2"])
def q_equalized_odds_report(spark, sf_dir):
    """Equalized-odds audit: per region, the classifier's true- and
    false-positive rates from exact confusion cells (a fair model has
    equal TPR and FPR across groups). NULL on empty margins.

    Ref semantics: SURVEY §2 J1/A2 (extension X-EQODDS)."""
    cells = _cells(spark, sf_dir)
    return cells.select(
        F.col("grp"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("tpr_6"),
        F.round(
            F.col("fp").cast("double")
            / F.nullif((F.col("fp") + F.col("tn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("fpr_6"),
    )


# ---------------------------------------------------------------------------
# 3. Predictive parity: per-group PPV / NPV.

PRED_PARITY_SQL = (
    "WITH "
    + _CELLS_CTE
    + """
SELECT grp, CAST(n AS BIGINT) AS n_orders,
       round(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS ppv_6,
       round(CAST(tn AS DOUBLE) / NULLIF(tn + fn, 0), 6) AS npv_6,
       round(CAST(tp + fn AS DOUBLE) / n, 6) AS prevalence_6
FROM cells
"""
)


@register("predictive_parity_report", oracle=PRED_PARITY_SQL, covers=["J1", "A2"])
def q_predictive_parity_report(spark, sf_dir):
    """Predictive-parity audit: per region, positive and negative
    predictive values plus outcome prevalence — calibration-style
    fairness (equal PPV across groups) from the same exact confusion
    cells. NULL on empty margins.

    Ref semantics: SURVEY §2 J1/A2 (extension X-PREDPARITY)."""
    cells = _cells(spark, sf_dir)
    nd = lambda c: F.nullif(c.cast("double"), F.lit(0.0))  # noqa: E731
    return cells.select(
        F.col("grp"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(
            F.col("tp").cast("double") / nd(F.col("tp") + F.col("fp")), 6
        ).alias("ppv_6"),
        F.round(
            F.col("tn").cast("double") / nd(F.col("tn") + F.col("fn")), 6
        ).alias("npv_6"),
        F.round((F.col("tp") + F.col("fn")).cast("double") / F.col("n"), 6).alias(
            "prevalence_6"
        ),
    )


# ---------------------------------------------------------------------------
# 4. Disparate-impact 80% rule (single-row verdict).

DI_FLAG_SQL = (
    "WITH "
    + _BASE_CTE
    + """,
g AS (
    SELECT grp, CAST(SUM(pred) AS DOUBLE) / COUNT(*) AS rate
    FROM base GROUP BY grp
),
agg AS (
    SELECT COUNT(*) AS n_groups, MIN(rate) AS min_rate, MAX(rate) AS max_rate
    FROM g
)
SELECT CAST(n_groups AS BIGINT) AS n_groups,
       round(min_rate, 6) AS min_rate_6,
       round(max_rate, 6) AS max_rate_6,
       round(min_rate / max_rate, 6) AS di_ratio_6,
       (min_rate / max_rate) < 0.8 AS fails_80pct_rule
FROM agg
"""
)


@register("disparate_impact_flag", oracle=DI_FLAG_SQL, covers=["J1", "A2", "P7"])
def q_disparate_impact_flag(spark, sf_dir):
    """The four-fifths (80%) rule verdict: the least-favored group's
    selection rate over the most-favored group's — below 0.8 is the
    regulatory disparate-impact flag. One 5-row reduction after the
    per-group rates.

    Ref semantics: SURVEY §2 J1/A2 (extension X-DI80)."""
    b = _base(spark, sf_dir)
    g = b.groupBy("grp").agg(
        (F.sum("pred").cast("double") / F.count(F.lit(1))).alias("rate")
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("rate").alias("min_rate"),
        F.max("rate").alias("max_rate"),
    )
    return agg.select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.round(F.col("min_rate"), 6).alias("min_rate_6"),
        F.round(F.col("max_rate"), 6).alias("max_rate_6"),
        F.round(F.col("min_rate") / F.col("max_rate"), 6).alias("di_ratio_6"),
        (F.col("min_rate") / F.col("max_rate") < 0.8).alias(
            "fails_80pct_rule"
        ),
    )


# ---------------------------------------------------------------------------
# 5. Theil T inequality decomposition (between vs within regions).

THEIL_SQL = """
WITH spend AS (
    SELECT c.c_custkey AS cust, r.r_name AS grp,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS x
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM spend),
t_total AS (
    SELECT SUM(t9) AS s9 FROM (
        SELECT CAST(round(round((CAST(x AS DOUBLE) / CAST(s AS DOUBLE))
                                * ln(CAST(x AS DOUBLE) * n / CAST(s AS DOUBLE)),
                                9) * 1000000000, 0) AS BIGINT) AS t9
        FROM spend CROSS JOIN tot
    )
),
grps AS (
    SELECT grp, COUNT(*) AS ng, SUM(CAST(x AS HUGEINT)) AS sg
    FROM spend GROUP BY grp
),
t_between AS (
    SELECT SUM(t9) AS s9 FROM (
        SELECT CAST(round(round((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
                                * ln((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
                                     / (CAST(ng AS DOUBLE) / n)),
                                9) * 1000000000, 0) AS BIGINT) AS t9
        FROM grps CROSS JOIN tot
    )
)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_customers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM grps) AS n_groups,
       round(CAST(t_total.s9 AS BIGINT) / 1000000000.0, 6) AS theil_total_6,
       round(CAST(t_between.s9 AS BIGINT) / 1000000000.0, 6)
           AS theil_between_6,
       round((CAST(t_total.s9 AS BIGINT) - t_between.s9) / 1000000000.0, 6)
           AS theil_within_6
FROM t_total CROSS JOIN t_between
"""


@register("theil_inequality_decomposition", oracle=THEIL_SQL, covers=["J1", "A2"])
def q_theil_inequality_decomposition(spark, sf_dir):
    """Theil T inequality of customer spend decomposed into between-
    region and within-region components (T_within reported as
    T_total - T_between, exact at term granularity). Per-customer
    terms (x/S)ln(xn/S) round to 9 dp and sum as scaled BIGINT
    nano-units — summation-order-proof; the only data-sized pass is
    the per-customer spend aggregation.

    Ref semantics: SURVEY §2 J1/A2 (extension X-THEIL)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
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
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("c_custkey").alias("cust"), F.col("r_name").alias("grp"))
        .agg(F.sum(dec(F.col("cents"))).cast("long").alias("x"))
    )
    tot = spend.agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec(F.col("x"))).alias("s")
    )
    xd = F.col("x").cast("double")
    sd = F.col("s").cast("double")
    t9 = F.round(
        F.round((xd / sd) * F.log(xd * F.col("n") / sd), 9) * 1000000000, 0
    ).cast("long")
    t_total = (
        spend.crossJoin(F.broadcast(tot)).select(t9.alias("t9")).agg(
            F.sum("t9").alias("s9_total")
        )
    )
    grps = spend.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"), F.sum(dec(F.col("x"))).alias("sg")
    )
    sgd = F.col("sg").cast("double")
    b9 = F.round(
        F.round(
            (sgd / sd)
            * F.log((sgd / sd) / (F.col("ng").cast("double") / F.col("n"))),
            9,
        )
        * 1000000000,
        0,
    ).cast("long")
    t_between = (
        grps.crossJoin(F.broadcast(tot))
        .select(b9.alias("t9"), F.lit(1).alias("one"))
        .agg(F.sum("t9").alias("s9_between"), F.sum("one").alias("n_groups"))
    )
    return (
        tot.crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(t_between))
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.round(F.col("s9_total") / 1000000000.0, 6).alias("theil_total_6"),
            F.round(F.col("s9_between") / 1000000000.0, 6).alias(
                "theil_between_6"
            ),
            F.round(
                (F.col("s9_total") - F.col("s9_between")) / 1000000000.0, 6
            ).alias("theil_within_6"),
        )
    )


# ---------------------------------------------------------------------------
# 6. Per-group two-proportion z-test vs the rest of the population.

RATE_ZTEST_SQL = (
    "WITH "
    + _BASE_CTE
    + """,
g AS (
    SELECT grp, COUNT(*) AS n, SUM(pred) AS pos FROM base GROUP BY grp
),
tot AS (SELECT SUM(n) AS nt, SUM(pos) AS post FROM g)
SELECT grp, CAST(n AS BIGINT) AS n_orders,
       round(CAST(pos AS DOUBLE) / n, 6) AS rate_6,
       round(CAST(post - pos AS DOUBLE) / (nt - n), 6) AS rest_rate_6,
       round((CAST(pos AS DOUBLE) / n - CAST(post - pos AS DOUBLE) / (nt - n))
             / sqrt((CAST(post AS DOUBLE) / nt)
                    * (1.0 - CAST(post AS DOUBLE) / nt)
                    * (1.0 / n + 1.0 / (nt - n))), 6) AS z_6
FROM g CROSS JOIN tot
"""
)


@register("group_rate_ztest", oracle=RATE_ZTEST_SQL, covers=["J1", "A2"])
def q_group_rate_ztest(spark, sf_dir):
    """Two-proportion z-test of each region's positive-prediction
    rate against the pooled rest-of-population rate — the standard
    'is this group treated differently' screen. Exact counts; the
    pooled-variance z is one guarded double expression.

    Ref semantics: SURVEY §2 J1/A2 (extension X-RATEZTEST)."""
    b = _base(spark, sf_dir)
    g = b.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pred").alias("pos")
    )
    tot = g.agg(F.sum("n").alias("nt"), F.sum("pos").alias("post"))
    j = g.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    rate = F.col("pos").cast("double") / nd
    rest = (F.col("post") - F.col("pos")).cast("double") / (
        F.col("nt") - F.col("n")
    )
    pool = F.col("post").cast("double") / F.col("nt")
    z = (rate - rest) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / nd + 1.0 / (F.col("nt") - F.col("n")))
    )
    return j.select(
        F.col("grp"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(rate, 6).alias("rate_6"),
        F.round(rest, 6).alias("rest_rate_6"),
        F.round(z, 6).alias("z_6"),
    )
