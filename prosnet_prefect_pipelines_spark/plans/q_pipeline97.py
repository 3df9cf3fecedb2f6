"""Pipeline batch 97 (north-star extension): paired, categorical and
concentration statistics — Wilcoxon signed-rank, chi-squared
independence, Gini concentration, Friedman blocked ranks,
Cochran–Armitage trend, and point-biserial correlation, all with the
catalog's exact-integer discipline so Spark and DuckDB agree
bit-for-bit.

Exactness conventions (continuing batches 95/96; see catalog.py):
- money scaled to integer cents BEFORE any aggregation;
- ranks are DOUBLED average ranks from per-distinct-value counts
  (dr = 2*cum_lt + c + 1, an exact BIGINT), cumulated over the
  DISTINCT-VALUE table — the only unpartitioned windows in the batch
  are |V|-sized, never fact-table-sized;
- wide products route through DECIMAL(38,0) on Spark / HUGEINT on
  DuckDB; each statistic performs its double divisions in ONE fixed
  expression shape shared verbatim by both engines;
- cell-count statistics (chi2, Friedman) fold their tens of double
  terms in cell-key order via F.aggregate(array_sort(collect_list))
  == list_reduce(list(... ORDER BY ...)) — identical IEEE sequence.

Scale notes: every query is one or two keyed aggregations over a
narrow projection; the rank cumulations run over distinct-value or
cell tables that are orders of magnitude smaller than the fact table.
Nothing joins fact rows to fact rows; gini's positional sum uses the
tie-block identity sum(i*x) = x*(cb*c + c(c+1)/2) so no per-row
row_number over the full table is ever materialized.

Ref semantics: SURVEY §2 A2/O1/J1 aggregation+join compositions; no
reference counterpart (extensions X-WILCOXON .. X-PBISERIAL).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.distrank import (
    prefix_sums,
)
from prosnet_prefect_pipelines_spark.plans.catalog import register

# r11 note: every cumulative window in this file runs over a
# DISTINCT-metric-value table. That is far smaller than the entity
# table it summarizes, but still value-cardinality (distinct spend
# values grow with the corpus), so the single-partition cumulations
# were latent scale cliffs — each now routes through the distributed
# two-pass prefix sum (operators/distrank.py), bit-identical (exact
# long cumulation; strict prefixes via cum_inclusive - count).

# ---------------------------------------------------------------------------
# 1. Wilcoxon signed-rank: customer spend 1995 vs 1996.

WILCOXON_SQL = """
WITH yr AS (
    SELECT o_custkey AS k, EXTRACT(year FROM o_orderdate) AS y,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2
),
pairs AS (
    SELECT b.cents - a.cents AS d
    FROM yr a JOIN yr b ON a.k = b.k AND a.y = 1995 AND b.y = 1996
    WHERE b.cents <> a.cents
),
counts AS (
    SELECT abs(d) AS v6, COUNT(*) AS c,
           SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos
    FROM pairs GROUP BY abs(d)
),
dr AS (
    SELECT v6, c, cpos,
           2 * COALESCE(SUM(c) OVER (ORDER BY v6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS dr
    FROM counts
),
agg AS (
    SELECT SUM(c) AS n, SUM(cpos * dr) AS wp2,
           SUM((c - cpos) * dr) AS wm2, SUM(c * c * c - c) AS tie
    FROM dr
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(wp2 AS BIGINT) AS w_plus_x2,
       CAST(wm2 AS BIGINT) AS w_minus_x2,
       round((CAST(wp2 AS DOUBLE) / 2.0
              - CAST(n * (n + 1) AS DOUBLE) / 4.0)
             / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                    - CAST(tie AS DOUBLE) / 48.0), 6) AS z
FROM agg
"""


@register("wilcoxon_signed_rank", oracle=WILCOXON_SQL, covers=["A2", "J1", "O1"])
def q_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank on paired customer spend (1995 vs 1996):
    rank |d| with average ranks, W+ = sum of positive-d ranks, with the
    tie-corrected normal z = (W+ - n(n+1)/4) /
    sqrt(n(n+1)(2n+1)/24 - sum(t^3-t)/48).

    Doubled ranks keep W+ exact (reported as w_plus_x2 = 2*W+, a
    BIGINT; the invariant w_plus_x2 + w_minus_x2 == n(n+1) is the
    self-check). The per-customer pair join is keyed on o_custkey
    (shuffle on the pair key, no fact-fact join); the ONE
    unpartitioned window runs over distinct |d| values.

    Ref semantics: SURVEY §2 A2/J1 (extension X-WILCOXON)."""
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
    )
    a = yr.filter(F.col("y") == 1995).select("k", F.col("cents").alias("ca"))
    b = yr.filter(F.col("y") == 1996).select("k", F.col("cents").alias("cb"))
    pairs = (
        a.join(b, on="k")
        .select((F.col("cb") - F.col("ca")).alias("d"))
        .filter(F.col("d") != 0)
    )
    counts = pairs.groupBy(F.abs("d").alias("v6")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("cpos"),
    )
    cum = prefix_sums(
        counts, [F.col("v6").asc()], {"_ci": F.col("c")}
    )
    dr = cum.withColumn(
        "dr", 2 * (F.col("_ci") - F.col("c")) + F.col("c") + 1
    )
    agg = dr.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("cpos") * F.col("dr")).alias("wp2"),
        F.sum((F.col("c") - F.col("cpos")) * F.col("dr")).alias("wm2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie"),
    )
    n = F.col("n")
    z = (
        F.col("wp2").cast("double") / F.lit(2.0)
        - (n * (n + 1)).cast("double") / F.lit(4.0)
    ) / F.sqrt(
        n.cast("double") * (n + 1) * (2 * n + 1) / F.lit(24.0)
        - F.col("tie").cast("double") / F.lit(48.0)
    )
    return agg.select(
        n.cast("long").alias("n"),
        F.col("wp2").cast("long").alias("w_plus_x2"),
        F.col("wm2").cast("long").alias("w_minus_x2"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# 2. Chi-squared independence: customer region x order priority.

CHI2_SQL = """
WITH cells AS (
    SELECT r.r_name AS rg, o.o_orderpriority AS pr, COUNT(*) AS o
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
rmarg AS (SELECT rg, SUM(o) AS rt FROM cells GROUP BY rg),
cmarg AS (SELECT pr, SUM(o) AS ct FROM cells GROUP BY pr),
tot AS (
    SELECT SUM(o) AS n, COUNT(DISTINCT rg) AS nr, COUNT(DISTINCT pr) AS nc
    FROM cells
),
terms AS (
    SELECT cells.rg, cells.pr,
           CAST(cells.o AS DOUBLE)
             - CAST(rmarg.rt AS DOUBLE) * cmarg.ct / tot.n AS dev,
           CAST(rmarg.rt AS DOUBLE) * cmarg.ct / tot.n AS e
    FROM cells
    JOIN rmarg USING (rg)
    JOIN cmarg USING (pr), tot
)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST((tot.nr - 1) * (tot.nc - 1) AS INT) AS dof,
       round((SELECT list_reduce(
                  list((dev * dev) / e ORDER BY rg, pr), (x, y) -> x + y)
              FROM terms), 6) AS chi2
FROM tot
"""


@register("chi2_independence", oracle=CHI2_SQL, covers=["A2", "J1"])
def q_chi2_independence(spark, sf_dir):
    """Pearson chi-squared for independence of customer region and
    order priority: chi2 = sum over OBSERVED cells of (O - E)^2/E with
    E = row_total*col_total/N (documented: absent structural cells
    contribute nothing — identical convention both engines).

    Cell counts and margins are exact integers; the R*C double terms
    fold in (region, priority) order. Dimension joins broadcast
    (region/nation are tiny); the statistic runs on the 25-cell
    contingency table, never on row pairs.

    Ref semantics: SURVEY §2 A2/J1 (extension X-CHI2-CONT)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority"
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
    cells = (
        orders.join(
            F.broadcast(
                cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
                .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                .select("c_custkey", "r_name")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("r_name").alias("rg"), F.col("o_orderpriority").alias("pr"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rmarg = cells.groupBy("rg").agg(F.sum("o").alias("rt"))
    cmarg = cells.groupBy("pr").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("rg").alias("nr"),
        F.count_distinct("pr").alias("nc"),
    )
    terms = (
        cells.join(F.broadcast(rmarg), on="rg")
        .join(F.broadcast(cmarg), on="pr")
        .crossJoin(F.broadcast(tot))
        .select(
            "rg",
            "pr",
            (
                F.col("o").cast("double")
                - F.col("rt").cast("double") * F.col("ct") / F.col("n")
            ).alias("dev"),
            (F.col("rt").cast("double") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    chi2 = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rg").alias("rg"),
                        F.col("pr").alias("pr"),
                        ((F.col("dev") * F.col("dev")) / F.col("e")).alias(
                            "term"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("term"),
        ).alias("chi2")
    )
    return tot.crossJoin(F.broadcast(chi2)).select(
        F.col("n").cast("long").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("dof"),
        F.round(F.col("chi2"), 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# 3. Gini concentration of customer spend.

GINI_SQL = """
WITH spend AS (
    SELECT o_custkey AS k,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
),
counts AS (SELECT cents AS v, COUNT(*) AS c FROM spend GROUP BY 1),
cum AS (
    SELECT v, c,
           COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM counts
),
agg AS (
    SELECT SUM(c) AS n,
           SUM(CAST(v AS HUGEINT) * c) AS s,
           SUM(CAST(v AS HUGEINT) * (CAST(cb AS HUGEINT) * c
               + CAST(c AS HUGEINT) * (c + 1) / 2)) AS s1
    FROM cum
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(s AS BIGINT) AS total_cents,
       round(CAST(2 * s1 - (n + 1) * s AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM agg
"""


@register("gini_customer_spend", oracle=GINI_SQL, covers=["A2", "O1"])
def q_gini_customer_spend(spark, sf_dir):
    """Gini coefficient of per-customer spend: G = (2*sum(i*x_(i))
    - (n+1)*sum(x)) / (n*sum(x)) over ascending spend.

    The positional sum uses the tie-block identity
    sum over a tie block of i*x = x*(cb*c + c(c+1)/2) — x is constant
    within the block so within-tie order is irrelevant — which removes
    the per-row global row_number: the only window is the cumulative
    count over DISTINCT spend values. Products route through
    DECIMAL(38,0)/HUGEINT; ONE final double division.

    Ref semantics: SURVEY §2 A2/O1 (extension X-GINI-RANKSUM)."""
    spend = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    counts = spend.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = prefix_sums(
        counts, [F.col("v").asc()], {"_ci": F.col("c")}
    )
    cum = cum.withColumn("cb", F.col("_ci") - F.col("c"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = cum.agg(
        F.sum("c").alias("n"),
        F.sum(dec(F.col("v")) * F.col("c")).alias("s"),
        F.sum(
            dec(F.col("v"))
            * (dec(F.col("cb")) * F.col("c") + dec(F.col("c")) * (F.col("c") + 1) / 2)
        ).alias("s1"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("total_cents"),
        F.round(
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n").cast("double") * F.col("s").cast("double")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# 4. Friedman blocked ranks: nation blocks x priority treatments.

FRIEDMAN_SQL = """
WITH cell AS (
    SELECT c.c_nationkey AS b, o.o_orderpriority AS t,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS s,
           COUNT(*) AS c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
kk AS (SELECT COUNT(DISTINCT o_orderpriority) AS k FROM orders),
full_blocks AS (
    SELECT b FROM cell GROUP BY b
    HAVING COUNT(*) = (SELECT k FROM kk)
),
vals AS (
    SELECT cell.b, cell.t, CAST(cell.s AS DOUBLE) / cell.c AS v
    FROM cell JOIN full_blocks USING (b)
),
counts AS (SELECT b, v, COUNT(*) AS c FROM vals GROUP BY b, v),
dr AS (
    SELECT b, v, c,
           2 * COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS dr
    FROM counts
),
rj AS (
    SELECT vals.t, SUM(dr.dr) AS rd
    FROM vals JOIN dr ON dr.b = vals.b AND dr.v = vals.v
    GROUP BY vals.t
),
meta AS (
    SELECT (SELECT COUNT(*) FROM full_blocks) AS b, (SELECT k FROM kk) AS k,
           (SELECT SUM(rd * rd) FROM rj) AS rd2
)
SELECT CAST(b AS BIGINT) AS blocks, CAST(k AS INT) AS k,
       CAST(rd2 AS BIGINT) AS sum_rd_sq,
       round(3.0 * CAST(rd2 AS DOUBLE)
             / (CAST(b AS DOUBLE) * k * (k + 1)) - 3.0 * b * (k + 1), 6)
           AS q_stat
FROM meta
"""


@register("friedman_nation_priority", oracle=FRIEDMAN_SQL, covers=["A2", "J1", "O1"])
def q_friedman_nation_priority(spark, sf_dir):
    """Friedman rank test: blocks = nations, treatments = order
    priorities, response = mean order value. Q = 12/(bk(k+1)) *
    sum_j R_j^2 - 3b(k+1); with doubled ranks (Rd = 2R) this is
    Q = 3*sum Rd_j^2/(bk(k+1)) - 3b(k+1), exact integers until the
    final division.

    The response v = s/c is one double division computed identically
    by both engines, so the within-block ordering (and the b-partition
    doubled-rank window over the k-row per-block value table) agrees
    bit-for-bit. Only blocks observing all k treatments enter.

    Ref semantics: SURVEY §2 A2/J1/O1 (extension X-FRIEDMAN)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    cell = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("b"), F.col("o_orderpriority").alias("t")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    kk = orders.agg(F.count_distinct("o_orderpriority").alias("k"))
    full_blocks = (
        cell.groupBy("b")
        .agg(F.count(F.lit(1)).alias("nt"))
        .crossJoin(F.broadcast(kk))
        .filter(F.col("nt") == F.col("k"))
        .select("b")
    )
    vals = cell.join(F.broadcast(full_blocks), on="b").select(
        "b", "t", (F.col("s").cast("double") / F.col("c")).alias("v")
    )
    counts = vals.groupBy("b", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dr = counts.withColumn(
        "dr", 2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
    )
    rj = (
        # dr is block-count x k rows — broadcast, never a shuffle join
        vals.join(F.broadcast(dr.select("b", "v", "dr")), on=["b", "v"])
        .groupBy("t")
        .agg(F.sum("dr").alias("rd"))
    )
    rd2 = rj.agg(F.sum(F.col("rd") * F.col("rd")).alias("rd2"))
    b_cnt = full_blocks.agg(F.count(F.lit(1)).alias("b"))
    meta = b_cnt.crossJoin(F.broadcast(kk)).crossJoin(F.broadcast(rd2))
    q = (
        F.lit(3.0)
        * F.col("rd2").cast("double")
        / (F.col("b").cast("double") * F.col("k") * (F.col("k") + 1))
        - F.lit(3.0) * F.col("b") * (F.col("k") + 1)
    )
    return meta.select(
        F.col("b").cast("long").alias("blocks"),
        F.col("k").cast("int").alias("k"),
        F.col("rd2").cast("long").alias("sum_rd_sq"),
        F.round(q, 6).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# 5. Cochran–Armitage trend: return rate across quantity buckets.

COCHRAN_SQL = """
WITH v AS (
    SELECT CAST(ceil(l_quantity / 5.0) AS INT) AS s,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
    FROM lineitem
),
grp AS (SELECT s, COUNT(*) AS ni, SUM(r) AS ri FROM v GROUP BY s),
tot AS (
    SELECT SUM(ni) AS n, SUM(ri) AS rr,
           SUM(CAST(s AS HUGEINT) * ri) AS sr,
           SUM(CAST(s AS HUGEINT) * ni) AS sn,
           SUM(CAST(s AS HUGEINT) * s * ni) AS s2n
    FROM grp
)
SELECT CAST(n AS BIGINT) AS n, CAST(rr AS BIGINT) AS positives,
       CAST(sr * n - rr * sn AS BIGINT) AS t_num,
       round(CAST(sr * n - rr * sn AS DOUBLE)
             / sqrt(CAST(rr * (n - rr) AS DOUBLE)
                    * CAST(n * s2n - sn * sn AS DOUBLE)
                    / CAST(n AS DOUBLE)), 6) AS z
FROM tot
"""


@register("cochran_armitage_trend", oracle=COCHRAN_SQL, covers=["A2", "O1"])
def q_cochran_armitage_trend(spark, sf_dir):
    """Cochran–Armitage test for monotone trend of the return rate
    across integer quantity buckets (scores s = ceil(qty/5)):
    T = sum s_i (r_i - n_i R/N), Var T = R(N-R)/N^3 *
    (N sum n_i s_i^2 - (sum n_i s_i)^2).

    Reported exact: t_num = N*T = N sum s_i r_i - R sum s_i n_i (a
    BIGINT); z = t_num / sqrt(R(N-R)(N sum n s^2 - (sum n s)^2)/N)
    in one shared double expression (the variance product exceeds
    int64 so it routes through DECIMAL(38,0)/HUGEINT). One narrow
    aggregation over lineitem; the trend statistic runs on the
    10-bucket table.

    Ref semantics: SURVEY §2 A2 (extension X-COCHRAN)."""
    v = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.ceil(F.col("l_quantity") / 5.0).cast("int").alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    grp = v.groupBy("s").agg(
        F.count(F.lit(1)).alias("ni"), F.sum("r").alias("ri")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = grp.agg(
        F.sum("ni").alias("n"),
        F.sum("ri").alias("rr"),
        F.sum(dec(F.col("s")) * F.col("ri")).alias("sr"),
        F.sum(dec(F.col("s")) * F.col("ni")).alias("sn"),
        F.sum(dec(F.col("s")) * F.col("s") * F.col("ni")).alias("s2n"),
    )
    t_num = F.col("sr") * F.col("n") - F.col("rr") * F.col("sn")
    z = t_num.cast("double") / F.sqrt(
        (dec(F.col("rr")) * (F.col("n") - F.col("rr"))).cast("double")
        * (F.col("n") * F.col("s2n") - F.col("sn") * F.col("sn")).cast("double")
        / F.col("n").cast("double")
    )
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.col("rr").cast("long").alias("positives"),
        t_num.cast("long").alias("t_num"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# 6. Point-biserial correlation: urgency flag vs order value.

PBISERIAL_SQL = """
WITH v AS (
    SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
           CAST(round(o_totalprice * 100) AS BIGINT) AS x
    FROM orders
),
agg AS (
    SELECT SUM(g) AS n1, COUNT(*) - SUM(g) AS n0, COUNT(*) AS n,
           SUM(CASE WHEN g = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) AS s1,
           SUM(CASE WHEN g = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) AS s0,
           SUM(CAST(x AS HUGEINT) * x) AS q,
           SUM(CAST(x AS HUGEINT)) AS s
    FROM v
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
       round(CAST(s1 * n0 - s0 * n1 AS DOUBLE)
             / sqrt(CAST(n1 * n0 AS DOUBLE))
             / sqrt(CAST(n * q - s * s AS DOUBLE)), 6) AS r_pb,
       round((CAST(s1 * n0 - s0 * n1 AS DOUBLE)
              * CAST(s1 * n0 - s0 * n1 AS DOUBLE))
             / CAST(n1 * n0 AS DOUBLE)
             / CAST(n * q - s * s AS DOUBLE), 6) AS r_sq
FROM agg
"""


@register("point_biserial_corr", oracle=PBISERIAL_SQL, covers=["A2"])
def q_point_biserial_corr(spark, sf_dir):
    """Point-biserial correlation between the urgency indicator and
    order value (integer cents): r_pb = (S1*n0 - S0*n1) /
    (sqrt(n1*n0) * sqrt(N*Q - S^2)) — the algebraic form whose
    numerator and both radicands are EXACT integers (cents sums and
    the population variance numerator N*sum(x^2) - (sum x)^2), so the
    only doubles are three casts and two sqrt/divides shared verbatim
    with the oracle.

    Single narrow aggregation over orders; wide products through
    DECIMAL(38,0)/HUGEINT (documented bound: |S1*n0 - S0*n1| fits 38
    digits through sf1000).

    Ref semantics: SURVEY §2 A2 (extension X-PBISERIAL)."""
    v = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = v.agg(
        F.sum("g").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g")).alias("n0"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("g") == 1, dec(F.col("x"))).otherwise(F.lit(0))).alias(
            "s1"
        ),
        F.sum(F.when(F.col("g") == 0, dec(F.col("x"))).otherwise(F.lit(0))).alias(
            "s0"
        ),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
        F.sum(dec(F.col("x"))).alias("s"),
    )
    d = F.col("s1") * F.col("n0") - F.col("s0") * F.col("n1")
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    r_pb = (
        d.cast("double")
        / F.sqrt((dec(F.col("n1")) * F.col("n0")).cast("double"))
        / F.sqrt(var_num.cast("double"))
    )
    r_sq = (
        (d.cast("double") * d.cast("double"))
        / (dec(F.col("n1")) * F.col("n0")).cast("double")
        / var_num.cast("double")
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        F.round(r_pb, 6).alias("r_pb"),
        F.round(r_sq, 6).alias("r_sq"),
    )
