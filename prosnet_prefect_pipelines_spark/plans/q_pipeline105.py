"""Pipeline batch 105 (north-star extension): classifier evaluation,
exactly — rank-based AUC, the Murphy decomposition of the Brier
score, threshold metrics (MCC / F1 / Youden's J / balanced
accuracy), Cohen's d effect size and the cumulative-gains table.

The evaluated "model" is deterministic and data-derived: per order,
the predicted score is the max lineitem discount in integer percent
(s in 0..10, predicted probability p = s/10) and the label is
whether any lineitem was returned. This puts real tied-score mass in
every query — the case naive AUC implementations get wrong.

Exactness conventions (the batch-95/99 discipline):
- AUC uses the doubled-average-rank identity over the DISTINCT-score
  table: dr_v = 2*cum_lt + c + 1, 2*R1 = sum pos_v * dr_v,
  AUC = (2*R1 - n1*(n1+1)) / (2*n1*n0) — all integers until one
  final division (ties averaged exactly, batch-96 discipline);
- Brier terms expand to integers on the s-scale:
  (p - y)^2 == (s - 10*y)^2 / 100; reliability/resolution keep
  integer numerators (n_k*s_k - 10*pos_k)^2 and
  (n*pos_k - n_k*P)^2 squared in DECIMAL(38,0)/HUGEINT BEFORE the
  double cast, summed as 9-dp scaled BIGINT nano-units per cell;
- every confusion-matrix statistic divides exact integers once,
  NULLIF-guarded.

Scale notes: one narrow lineitem aggregation keyed by l_orderkey
(map-side combinable) feeds everything; the per-score tables hold at
most 11 rows (distinct discount percents), so every window/rollup
after the fact pass is constant-size. No fact-fact joins.

Ref semantics: SURVEY §2 A2/O1 compositions; no reference
counterpart (extensions X-AUC .. X-CUMGAINS).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# per-order score (max discount in integer percent, 0..10) and label
# (any lineitem returned)
_SCORED_CTE = """
scored AS (
    SELECT l_orderkey AS okey,
           CAST(round(MAX(l_discount) * 100) AS BIGINT) AS s,
           MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
    FROM lineitem GROUP BY 1
),
cells AS (
    SELECT s, COUNT(*) AS c, SUM(y) AS pos FROM scored GROUP BY s
),
tot AS (SELECT SUM(c) AS n, SUM(pos) AS p FROM cells)
"""


def _scored(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_discount", "l_returnflag"
    )
    return li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.round(F.max("l_discount") * 100).cast("long").alias("s"),
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("y"),
    )


def _cells(spark, sf_dir):
    return (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos"))
    )


# ---------------------------------------------------------------------------
# 1. Exact tie-averaged AUC via doubled ranks.

AUC_SQL = (
    "WITH "
    + _SCORED_CTE
    + """,
cum AS (
    SELECT s, c, pos,
           COALESCE(SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum_lt
    FROM cells
),
r1 AS (
    SELECT SUM(CAST(pos AS HUGEINT) * (2 * cum_lt + c + 1)) AS r1x2 FROM cum
)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(n - p AS BIGINT) AS n_neg,
       round(CAST(r1x2 - CAST(p AS HUGEINT) * (p + 1) AS DOUBLE)
             / (2.0 * CAST(p AS DOUBLE) * (n - p)), 6) AS auc_6,
       round(CAST(r1x2 - CAST(p AS HUGEINT) * (p + 1) AS DOUBLE)
             / (CAST(p AS DOUBLE) * (n - p)) - 1.0, 6) AS gini_6
FROM r1 CROSS JOIN tot
"""
)


@register("auc_exact_rank", oracle=AUC_SQL, covers=["A2", "O1"])
def q_auc_exact_rank(spark, sf_dir):
    """Exact ROC AUC by the rank-sum identity with tie averaging:
    doubled average ranks dr_v = 2*cum_lt + c + 1 over the 11-row
    distinct-score table keep everything integer until one final
    division; gini = 2*AUC - 1 from the same rational. Equivalent to
    the Mann-Whitney U normalization — the threshold-free companion
    of roc_points_fixed.

    Ref semantics: SURVEY §2 A2/O1 (extension X-AUC)."""
    cells = _cells(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.withColumn(
        "cum_lt", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum(dec(F.col("pos")) * (2 * F.col("cum_lt") + F.col("c") + 1)).alias(
            "r1x2"
        ),
        F.sum("c").alias("n"),
        F.sum("pos").alias("p"),
    )
    num = (F.col("r1x2") - dec(F.col("p")) * (F.col("p") + 1)).cast("double")
    pd_ = F.col("p").cast("double")
    n0 = (F.col("n") - F.col("p")).cast("double")
    return agg.select(
        F.col("p").cast("long").alias("n_pos"),
        (F.col("n") - F.col("p")).cast("long").alias("n_neg"),
        F.round(num / (2.0 * pd_ * n0), 6).alias("auc_6"),
        F.round(num / (pd_ * n0) - 1.0, 6).alias("gini_6"),
    )


# ---------------------------------------------------------------------------
# 2. Brier score with the Murphy decomposition.

BRIER_SQL = (
    "WITH "
    + _SCORED_CTE
    + """,
direct AS (
    SELECT SUM(CAST(pos AS HUGEINT) * (s - 10) * (s - 10)
               + CAST(c - pos AS HUGEINT) * s * s) AS bnum
    FROM cells
),
relterm AS (
    SELECT SUM(CAST(round(round(CAST((CAST(c AS HUGEINT) * s - 10 * pos)
                                     * (CAST(c AS HUGEINT) * s - 10 * pos)
                                     AS DOUBLE)
                                / (100.0 * c), 9) * 1000000000, 0)
               AS BIGINT)) AS rel9
    FROM cells
),
resterm AS (
    SELECT SUM(CAST(round(round(CAST((CAST(n AS HUGEINT) * pos - CAST(c AS HUGEINT) * p)
                                     * (CAST(n AS HUGEINT) * pos - CAST(c AS HUGEINT) * p)
                                     AS DOUBLE)
                                / (CAST(n AS DOUBLE) * n * c), 9)
                          * 1000000000, 0) AS BIGINT)) AS res9
    FROM cells CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n_orders,
       round(CAST(bnum AS DOUBLE) / (100.0 * n), 6) AS brier_6,
       round(CAST(rel9 AS BIGINT) / 1000000000.0 / n, 6) AS reliability_6,
       round(CAST(res9 AS BIGINT) / 1000000000.0 / n, 6) AS resolution_6,
       round(CAST(CAST(p AS HUGEINT) * (n - p) AS DOUBLE)
             / (CAST(n AS DOUBLE) * n), 6) AS uncertainty_6
FROM direct CROSS JOIN relterm CROSS JOIN resterm CROSS JOIN tot
"""
)


@register("brier_murphy_decomposition", oracle=BRIER_SQL, covers=["A2"])
def q_brier_murphy_decomposition(spark, sf_dir):
    """Brier score of the discount-probability model (p = s/10) with
    Murphy's decomposition: BS = reliability - resolution +
    uncertainty. The direct score expands to integers on the s-scale
    ((p-y)^2 = (s-10y)^2/100); reliability/resolution numerators
    square in DECIMAL(38,0) BEFORE the double cast and sum as 9-dp
    scaled nano-units per score cell (11 cells).

    Ref semantics: SURVEY §2 A2 (extension X-BRIER)."""
    cells = _cells(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = cells.agg(F.sum("c").alias("n"), F.sum("pos").alias("p"))
    direct = cells.agg(
        F.sum(
            dec(F.col("pos")) * (F.col("s") - 10) * (F.col("s") - 10)
            + dec(F.col("c") - F.col("pos")) * F.col("s") * F.col("s")
        ).alias("bnum")
    )
    relnum = dec(F.col("c")) * F.col("s") - 10 * F.col("pos")
    rel9 = F.round(
        F.round(
            (relnum * relnum).cast("double") / (100.0 * F.col("c")), 9
        )
        * 1000000000,
        0,
    ).cast("long")
    rel = cells.select(rel9.alias("t9")).agg(F.sum("t9").alias("rel9"))
    resnum = dec(F.col("n")) * F.col("pos") - dec(F.col("c")) * F.col("p")
    res9 = F.round(
        F.round(
            (resnum * resnum).cast("double")
            / (F.col("n").cast("double") * F.col("n") * F.col("c")),
            9,
        )
        * 1000000000,
        0,
    ).cast("long")
    res = (
        cells.crossJoin(F.broadcast(tot))
        .select(res9.alias("t9"))
        .agg(F.sum("t9").alias("res9"))
    )
    nd = F.col("n").cast("double")
    return (
        tot.crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(rel))
        .crossJoin(F.broadcast(res))
        .select(
            F.col("n").cast("long").alias("n_orders"),
            F.round(F.col("bnum").cast("double") / (100.0 * F.col("n")), 6).alias(
                "brier_6"
            ),
            F.round(F.col("rel9") / 1000000000.0 / F.col("n"), 6).alias(
                "reliability_6"
            ),
            F.round(F.col("res9") / 1000000000.0 / F.col("n"), 6).alias(
                "resolution_6"
            ),
            F.round(
                (dec(F.col("p")) * (F.col("n") - F.col("p"))).cast("double")
                / (nd * nd),
                6,
            ).alias("uncertainty_6"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Threshold metrics: MCC, F1, Youden's J, balanced accuracy.

THRESH_METRICS_SQL = (
    "WITH "
    + _SCORED_CTE
    + """,
cm AS (
    SELECT SUM(CASE WHEN s >= 5 AND y = 1 THEN 1 ELSE 0 END) AS tp,
           SUM(CASE WHEN s >= 5 AND y = 0 THEN 1 ELSE 0 END) AS fp,
           SUM(CASE WHEN s < 5 AND y = 1 THEN 1 ELSE 0 END) AS fn,
           SUM(CASE WHEN s < 5 AND y = 0 THEN 1 ELSE 0 END) AS tn
    FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       round(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1_6,
       round((CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0)
              + CAST(tn AS DOUBLE) / NULLIF(tn + fp, 0)) / 2.0, 6)
           AS balanced_acc_6,
       round(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0)
             + CAST(tn AS DOUBLE) / NULLIF(tn + fp, 0) - 1.0, 6)
           AS youden_j_6,
       round(CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
                  AS DOUBLE)
             / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                    * (tn + fp) * (tn + fn)), 6) AS mcc_6
FROM cm
"""
)


@register("threshold_metrics_exact", oracle=THRESH_METRICS_SQL, covers=["A2", "P7"])
def q_threshold_metrics_exact(spark, sf_dir):
    """The full single-threshold report at p >= 0.5 (s >= 5): exact
    confusion cells plus F1, balanced accuracy, Youden's J and
    Matthews correlation — the integer numerator tp*tn - fp*fn
    squares/products stay in DECIMAL(38,0) and the denominator
    multiplies as doubles in a fixed expression order.

    Ref semantics: SURVEY §2 A2 (extension X-MCC)."""
    sc = _scored(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    cm = sc.agg(
        F.sum(((F.col("s") >= 5) & (F.col("y") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("s") >= 5) & (F.col("y") == 0)).cast("int")).alias("fp"),
        F.sum(((F.col("s") < 5) & (F.col("y") == 1)).cast("int")).alias("fn"),
        F.sum(((F.col("s") < 5) & (F.col("y") == 0)).cast("int")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    nd = lambda c: F.nullif(c.cast("double"), F.lit(0.0))  # noqa: E731
    tpr = tp.cast("double") / nd(tp + fn)
    tnr = tn.cast("double") / nd(tn + fp)
    return cm.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(2.0 * tp / nd(2 * tp + fp + fn), 6).alias("f1_6"),
        F.round((tpr + tnr) / 2.0, 6).alias("balanced_acc_6"),
        F.round(tpr + tnr - 1.0, 6).alias("youden_j_6"),
        F.round(
            (dec(tp) * tn - dec(fp) * fn).cast("double")
            / F.sqrt(
                (tp + fp).cast("double")
                * (tp + fn)
                * (tn + fp)
                * (tn + fn)
            ),
            6,
        ).alias("mcc_6"),
    )


# ---------------------------------------------------------------------------
# 4. Cohen's d / Hedges' g effect size of order value by label.

COHENS_D_SQL = """
WITH labeled AS (
    SELECT o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
           MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
g AS (
    SELECT y, COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s1,
           SUM(CAST(x AS HUGEINT) * x) AS s2
    FROM labeled GROUP BY y
),
w AS (
    SELECT MAX(CASE WHEN y = 1 THEN n END) AS n1,
           MAX(CASE WHEN y = 1 THEN s1 END) AS s11,
           MAX(CASE WHEN y = 1 THEN s2 END) AS s21,
           MAX(CASE WHEN y = 0 THEN n END) AS n0,
           MAX(CASE WHEN y = 0 THEN s1 END) AS s10,
           MAX(CASE WHEN y = 0 THEN s2 END) AS s20
    FROM g
),
d AS (
    SELECT n1, n0,
           CAST(s11 AS DOUBLE) / n1 - CAST(s10 AS DOUBLE) / n0 AS mdiff,
           sqrt(((CAST(s21 AS DOUBLE) - CAST(s11 AS DOUBLE) * s11 / n1)
                 + (CAST(s20 AS DOUBLE) - CAST(s10 AS DOUBLE) * s10 / n0))
                / (n1 + n0 - 2)) AS sd_pooled
    FROM w
)
SELECT CAST(n1 AS BIGINT) AS n_returned, CAST(n0 AS BIGINT) AS n_kept,
       round(mdiff / sd_pooled, 6) AS cohens_d_6,
       round((mdiff / sd_pooled)
             * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0)), 6) AS hedges_g_6
FROM d
"""


@register("cohens_d_order_value", oracle=COHENS_D_SQL, covers=["J1", "A2"])
def q_cohens_d_order_value(spark, sf_dir):
    """Cohen's d standardized mean difference of order value between
    returned and non-returned orders, with the Hedges' g small-sample
    correction — pooled SD from exact HUGEINT power sums (the
    documented sf1000 path would apply batch 99's shift trick). One
    keyed orders-lineitem join + a 2-group rollup.

    Ref semantics: SURVEY §2 J1/A2 (extension X-COHEND)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    labeled = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "x")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("y"))
    )
    g = labeled.groupBy("y").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("s1"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("s2"),
    )
    pick = lambda y, c: F.max(F.when(F.col("y") == y, F.col(c)))  # noqa: E731
    w = g.agg(
        pick(1, "n").alias("n1"), pick(1, "s1").alias("s11"),
        pick(1, "s2").alias("s21"), pick(0, "n").alias("n0"),
        pick(0, "s1").alias("s10"), pick(0, "s2").alias("s20"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    mdiff = F.col("s11").cast("double") / n1d - F.col("s10").cast("double") / n0d
    sd = F.sqrt(
        (
            (
                F.col("s21").cast("double")
                - F.col("s11").cast("double") * F.col("s11") / F.col("n1")
            )
            + (
                F.col("s20").cast("double")
                - F.col("s10").cast("double") * F.col("s10") / F.col("n0")
            )
        )
        / (F.col("n1") + F.col("n0") - 2)
    )
    d = mdiff / sd
    return w.select(
        F.col("n1").cast("long").alias("n_returned"),
        F.col("n0").cast("long").alias("n_kept"),
        F.round(d, 6).alias("cohens_d_6"),
        F.round(
            d * (1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n0")) - 9.0)), 6
        ).alias("hedges_g_6"),
    )


# ---------------------------------------------------------------------------
# 5. Cumulative gains / lift table by descending score.

CUM_GAINS_SQL = (
    "WITH "
    + _SCORED_CTE
    + """,
cum AS (
    SELECT s,
           SUM(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_n,
           SUM(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_pos
    FROM cells
)
SELECT CAST(s AS BIGINT) AS score_pct,
       CAST(cum_n AS BIGINT) AS cum_orders,
       CAST(cum_pos AS BIGINT) AS cum_positives,
       round(CAST(cum_n AS DOUBLE) / n, 6) AS depth_6,
       round(CAST(cum_pos AS DOUBLE) / p, 6) AS gain_6,
       round(CAST(CAST(cum_pos AS HUGEINT) * n AS DOUBLE)
             / (CAST(cum_n AS DOUBLE) * p), 6) AS lift_6
FROM cum CROSS JOIN tot
"""
)


@register("cumulative_gains_by_score", oracle=CUM_GAINS_SQL, covers=["A2", "O1"])
def q_cumulative_gains_by_score(spark, sf_dir):
    """Cumulative gains / lift table: targeting the top score buckets
    first, the share of all positives captured at each depth and the
    lift over random targeting — running sums over the 11-row
    distinct-score table in DESCENDING score order; the lift keeps
    its cum_pos*n integer product exact before the one division.

    Ref semantics: SURVEY §2 A2/O1 (extension X-CUMGAINS)."""
    cells = _cells(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = cells.agg(F.sum("c").alias("n"), F.sum("pos").alias("p"))
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        F.col("s"),
        F.sum("c").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("s").cast("long").alias("score_pct"),
        F.col("cum_n").cast("long").alias("cum_orders"),
        F.col("cum_pos").cast("long").alias("cum_positives"),
        F.round(F.col("cum_n").cast("double") / F.col("n"), 6).alias("depth_6"),
        F.round(F.col("cum_pos").cast("double") / F.col("p"), 6).alias(
            "gain_6"
        ),
        F.round(
            (dec(F.col("cum_pos")) * F.col("n")).cast("double")
            / (F.col("cum_n").cast("double") * F.col("p")),
            6,
        ).alias("lift_6"),
    )
