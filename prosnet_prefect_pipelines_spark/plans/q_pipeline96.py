"""Pipeline batch 96 (north-star extension): rank & ordinal statistics
— the nonparametric counterpart of batch 95's exact classical suite.
Kruskal–Wallis H, Mann–Whitney U, Spearman rho, Goodman–Kruskal gamma /
Somers' D, Kendall tau-b, and Brown–Forsythe robust ANOVA, all with the
catalog's exact-integer discipline so Spark and DuckDB agree
bit-for-bit.

Exactness conventions (continuing batch 95; see catalog.py docstring):
- ranks are DOUBLED average ranks computed from per-distinct-value
  counts: dr(v) = 2*|{x < v}| + |{x == v}| + 1 is an exact BIGINT, so
  rank sums, U statistics and tie terms stay integer until ONE final
  double division;
- the rank cumulation runs over the DISTINCT-VALUE table (|V| rows),
  not the fact table — the only unpartitioned window in the batch is
  |V|-sized, and the per-group variants partition by group;
- wide products route through DECIMAL(38,0) on Spark / HUGEINT on
  DuckDB; k-sized per-group double terms fold in group-key order
  (identical IEEE sequence both engines);
- concordance statistics (gamma, Somers' D, tau-b) run on the
  CONTINGENCY CELLS (tens of rows), never on row pairs: C/D/tie counts
  are exact integer sums over the cell cross join.

Scale notes: every query is one or two keyed aggregations over a
narrow projection plus arithmetic on a distinct-value or cell table
that is orders of magnitude smaller than the fact table. Nothing joins
fact rows to fact rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# Shared doubled-rank scaffolding (Spark side).


def _doubled_ranks(v, part_cols: list[str]):
    """(part..., v6, c, dr): per distinct value within partition, its
    multiplicity c and doubled average rank dr = 2*cum_lt + c + 1.

    Partitioned callers keep the keyed window (parallel by key). The
    UNPARTITIONED case (r11) routes through the distributed two-pass
    prefix sum — the distinct-value table is value-cardinality, so the
    old single-partition window was a latent scale cliff; strict prefix
    via cum_inclusive - c, bit-identical."""
    counts = v.groupBy(*part_cols, "v6").agg(F.count(F.lit(1)).alias("c"))
    if part_cols:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy("v6")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.withColumn(
            "dr",
            2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1,
        )
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_sums,
    )

    cum = prefix_sums(
        counts, [F.col("v6").asc()], {"_ci": F.col("c")}
    )
    return cum.withColumn(
        "dr", 2 * (F.col("_ci") - F.col("c")) + F.col("c") + 1
    ).drop("_ci")


_DR_CTE = """
counts AS (
    SELECT {parts} v6, COUNT(*) AS c FROM v GROUP BY {parts} v6
),
dr AS (
    SELECT {parts} v6, c,
           2 * COALESCE(SUM(c) OVER ({pwin} ORDER BY v6
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS dr
    FROM counts
)
"""

# ---------------------------------------------------------------------------
# 1. Kruskal–Wallis H (events.value by event_type), tie-corrected.

KRUSKAL_SQL = (
    """
WITH v AS (
    SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events WHERE value IS NOT NULL
),
"""
    + _DR_CTE.format(parts="", pwin="")
    + """,
gc AS (
    SELECT c2.g, SUM(c2.c) AS ni, SUM(c2.c * dr.dr) AS rd
    FROM (SELECT g, v6, COUNT(*) AS c FROM v GROUP BY g, v6) c2
    JOIN dr ON dr.v6 = c2.v6
    GROUP BY c2.g
),
tot AS (
    SELECT COUNT(*) AS k, SUM(ni) AS n,
           list_reduce(
               list((CAST(rd AS DOUBLE) * rd) / CAST(ni AS DOUBLE)
                    ORDER BY g),
               (x, y) -> x + y) AS sum_term
    FROM gc
),
ties AS (
    SELECT SUM(c * c * c - c) AS tie FROM dr
)
SELECT CAST(tot.k AS INT) AS k,
       CAST(tot.n AS BIGINT) AS n,
       CAST(ties.tie AS BIGINT) AS tie_weight,
       round((3.0 * tot.sum_term)
             / CAST(tot.n * (tot.n + 1) AS DOUBLE) - 3.0 * (tot.n + 1), 6)
           AS h_uncorrected,
       round(1.0 - CAST(ties.tie AS DOUBLE)
                   / CAST(tot.n * tot.n * tot.n - tot.n AS DOUBLE), 6)
           AS tie_correction,
       round(((3.0 * tot.sum_term)
              / CAST(tot.n * (tot.n + 1) AS DOUBLE) - 3.0 * (tot.n + 1))
             / (1.0 - CAST(ties.tie AS DOUBLE)
                      / CAST(tot.n * tot.n * tot.n - tot.n AS DOUBLE)), 6)
           AS h
FROM tot, ties
"""
)


@register("kruskal_wallis_h", oracle=KRUSKAL_SQL, covers=["A2", "O1", "J1"])
def q_kruskal_wallis_h(spark, sf_dir):
    """Kruskal–Wallis rank ANOVA: H = 12/(N(N+1)) * sum R_i^2/n_i
    - 3(N+1), divided by the tie correction 1 - sum(t^3-t)/(N^3-N) —
    the distribution-free "does any group differ" screen.

    Doubled average ranks keep every rank sum an exact BIGINT (with
    Rd = 2R the identity becomes H = 3*sum(Rd_i^2/n_i)/(N(N+1))
    - 3(N+1)); the k per-group terms fold as doubles in group order.
    The ONE unpartitioned window runs over the distinct-value table
    (|V| ~ 2/3 N here, but sketchable/bucketable at 100 TB), never the
    fact table.

    Ref semantics: SURVEY §2 A2/O1 aggregation+ordering composition;
    no reference counterpart (extension X-KRUSKAL)."""
    from prosnet_prefect_pipelines_spark.model import read_events

    v = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
        )
    )
    dr = _doubled_ranks(v, [])
    gcounts = v.groupBy("g", "v6").agg(F.count(F.lit(1)).alias("c"))
    gc = (
        gcounts.join(dr.select("v6", "dr"), on="v6")
        .groupBy("g")
        .agg(
            F.sum("c").alias("ni"),
            F.sum(F.col("c") * F.col("dr")).alias("rd"),
        )
    )
    tot = gc.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("g").alias("g"),
                        (
                            (F.col("rd").cast("double") * F.col("rd"))
                            / F.col("ni").cast("double")
                        ).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("term"),
        ).alias("sum_term"),
    )
    ties = dr.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie")
    )
    h_unc = (F.lit(3.0) * F.col("sum_term")) / (
        F.col("n") * (F.col("n") + 1)
    ).cast("double") - F.lit(3.0) * (F.col("n") + 1)
    corr = F.lit(1.0) - F.col("tie").cast("double") / (
        F.col("n") * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    return tot.crossJoin(F.broadcast(ties)).select(
        F.col("k").cast("int").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("tie").cast("long").alias("tie_weight"),
        F.round(h_unc, 6).alias("h_uncorrected"),
        F.round(corr, 6).alias("tie_correction"),
        F.round(h_unc / corr, 6).alias("h"),
    )


# ---------------------------------------------------------------------------
# 2. Mann–Whitney U (click vs view), tie-corrected normal approximation.

MANNWHITNEY_SQL = (
    """
WITH v AS (
    SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events
    WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
"""
    + _DR_CTE.format(parts="", pwin="")
    + """,
gc AS (
    SELECT c2.g, SUM(c2.c) AS ni, SUM(c2.c * dr.dr) AS rd
    FROM (SELECT g, v6, COUNT(*) AS c FROM v GROUP BY g, v6) c2
    JOIN dr ON dr.v6 = c2.v6
    GROUP BY c2.g
),
sides AS (
    SELECT MAX(CASE WHEN g = 'click' THEN ni END) AS n1,
           MAX(CASE WHEN g = 'view' THEN ni END) AS n2,
           MAX(CASE WHEN g = 'click' THEN rd END) AS rd1
    FROM gc
),
ties AS (SELECT SUM(c * c * c - c) AS tie FROM dr)
SELECT 'click' AS g1, 'view' AS g2,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(rd1 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       round(((CAST(rd1 - n1 * (n1 + 1) AS DOUBLE) / 2.0)
              - (CAST(n1 AS DOUBLE) * n2) / 2.0)
             / sqrt(((CAST(n1 AS DOUBLE) * n2) / 12.0)
                    * ((n1 + n2 + 1)
                       - CAST(ties.tie AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6)
           AS z
FROM sides, ties
"""
)


@register("mann_whitney_u", oracle=MANNWHITNEY_SQL, covers=["A2", "O1"])
def q_mann_whitney_u(spark, sf_dir):
    """Mann–Whitney U for click-vs-view event values: U1 = R1
    - n1(n1+1)/2 with average-rank ties, reported as the exact integer
    2*U1 (U is half-integer under ties), plus the tie-corrected normal
    z = (U1 - n1n2/2) / sqrt(n1n2/12 * ((N+1) - sum(t^3-t)/(N(N-1)))).

    Same doubled-rank scaffold as kruskal_wallis_h restricted to two
    groups; with Rd = 2R the doubled U is Rd1 - 2*n1(n1+1)/2*... =
    Rd1 - n1(n1+1), an exact BIGINT."""
    from prosnet_prefect_pipelines_spark.model import read_events

    v = (
        read_events(spark, sf_dir)
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "view")
        )
        .select(
            F.col("event_type").alias("g"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
        )
    )
    dr = _doubled_ranks(v, [])
    gcounts = v.groupBy("g", "v6").agg(F.count(F.lit(1)).alias("c"))
    gc = (
        gcounts.join(dr.select("v6", "dr"), on="v6")
        .groupBy("g")
        .agg(
            F.sum("c").alias("ni"),
            F.sum(F.col("c") * F.col("dr")).alias("rd"),
        )
    )
    sides = gc.agg(
        F.max(F.when(F.col("g") == "click", F.col("ni"))).alias("n1"),
        F.max(F.when(F.col("g") == "view", F.col("ni"))).alias("n2"),
        F.max(F.when(F.col("g") == "click", F.col("rd"))).alias("rd1"),
    )
    ties = dr.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie")
    )
    u1x2 = F.col("rd1") - F.col("n1") * (F.col("n1") + 1)
    u1 = u1x2.cast("double") / F.lit(2.0)
    mu = (F.col("n1").cast("double") * F.col("n2")) / F.lit(2.0)
    nn = F.col("n1") + F.col("n2")
    sigma2 = ((F.col("n1").cast("double") * F.col("n2")) / F.lit(12.0)) * (
        (nn + 1)
        - F.col("tie").cast("double") / (nn.cast("double") * (nn - 1))
    )
    return sides.crossJoin(F.broadcast(ties)).select(
        F.lit("click").alias("g1"),
        F.lit("view").alias("g2"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        u1x2.cast("long").alias("u1_x2"),
        F.round((u1 - mu) / F.sqrt(sigma2), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# 3. Spearman rho per priority bucket (price vs order recency).

SPEARMAN_SQL = """
WITH v AS (
    SELECT o_orderpriority AS g,
           CAST(round(o_totalprice * 100) AS BIGINT) AS x,
           (epoch_us(o_orderdate) // 86400000000) AS y
    FROM orders
),
xc AS (SELECT g, x, COUNT(*) AS c FROM v GROUP BY g, x),
xdr AS (
    SELECT g, x,
           2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS dx
    FROM xc
),
yc AS (SELECT g, y, COUNT(*) AS c FROM v GROUP BY g, y),
ydr AS (
    SELECT g, y,
           2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS dy
    FROM yc
),
ranked AS (
    SELECT v.g, xdr.dx, ydr.dy
    FROM v
    JOIN xdr ON xdr.g = v.g AND xdr.x = v.x
    JOIN ydr ON ydr.g = v.g AND ydr.y = v.y
),
sums AS (
    SELECT g, COUNT(*) AS n,
           SUM(CAST(dx AS HUGEINT)) AS sx,
           SUM(CAST(dy AS HUGEINT)) AS sy,
           SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
           SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
           SUM(CAST(dy AS HUGEINT) * dy) AS syy
    FROM ranked GROUP BY g
)
SELECT g, CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
FROM sums ORDER BY g
"""


@register("spearman_rho_price_recency", oracle=SPEARMAN_SQL, covers=["A2", "O1", "J1"])
def q_spearman_rho_price_recency(spark, sf_dir):
    """Spearman rank correlation between order price and order date per
    priority bucket — the monotone-association check that is robust to
    any monotone transform of either axis.

    rho = Pearson on doubled average ranks: with integer dx, dy the
    moment sums are exact (DECIMAL(38,0)/HUGEINT; doubling cancels in
    the ratio), and the final expression num / (sqrt(varx)*sqrt(vary))
    is evaluated in that exact operand order in both engines. Rank
    windows partition by priority bucket."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # floor-division epoch day (post-epoch here, but the pmod form keeps
    # the convention of q_pipeline95's ISO-weekday fix)
    v = o.select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
    ).select(
        "g",
        "x",
        F.expr("(us - pmod(us, 86400000000)) div 86400000000").alias("y"),
    )

    def dranks(col):
        counts = v.groupBy("g", col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("g")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.withColumn(
            "d" + col,
            2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1,
        ).select("g", col, "d" + col)

    ranked = v.join(dranks("x"), on=["g", "x"]).join(dranks("y"), on=["g", "y"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    sums = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("dx")).alias("sx"),
        F.sum(dec("dy")).alias("sy"),
        F.sum(dec("dx") * F.col("dy")).alias("sxy"),
        F.sum(dec("dx") * F.col("dx")).alias("sxx"),
        F.sum(dec("dy") * F.col("dy")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        sums.select(
            "g",
            F.col("n").cast("long").alias("n"),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("rho"),
        )
        .orderBy("g")
    )


# ---------------------------------------------------------------------------
# 4 + 5. Concordance statistics over the priority x quarter cells.

_CELLS_CTE = """
cells AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS a,
           quarter(o_orderdate) AS b,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
),
conc AS (
    SELECT
        SUM(CASE WHEN c2.a > c1.a AND c2.b > c1.b
                 THEN CAST(c1.n AS HUGEINT) * c2.n END) AS c,
        SUM(CASE WHEN c2.a > c1.a AND c2.b < c1.b
                 THEN CAST(c1.n AS HUGEINT) * c2.n END) AS d,
        SUM(CASE WHEN c2.a > c1.a AND c2.b = c1.b
                 THEN CAST(c1.n AS HUGEINT) * c2.n END) AS ty,
        SUM(CASE WHEN c2.a = c1.a AND c2.b > c1.b
                 THEN CAST(c1.n AS HUGEINT) * c2.n END) AS tx
    FROM cells c1, cells c2
)
"""

GAMMA_SQL = (
    "WITH "
    + _CELLS_CTE
    + """
SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
       CAST(tx AS BIGINT) AS tied_x_only, CAST(ty AS BIGINT) AS tied_y_only,
       round(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6) AS gamma,
       round(CAST(c - d AS DOUBLE) / CAST(c + d + ty AS DOUBLE), 6)
           AS somers_d_yx
FROM conc
"""
)


def _cells_and_conc(spark, sf_dir):
    cells = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("a"),
            F.quarter("o_orderdate").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c1 = cells.select(
        F.col("a").alias("a1"), F.col("b").alias("b1"), F.col("n").alias("n1")
    )
    c2 = cells.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("n").alias("n2")
    )
    prod = (F.col("n1").cast("decimal(38,0)") * F.col("n2"))
    pairs = c1.crossJoin(F.broadcast(c2))
    return pairs.agg(
        F.sum(
            F.when((F.col("a2") > F.col("a1")) & (F.col("b2") > F.col("b1")), prod)
        ).alias("c"),
        F.sum(
            F.when((F.col("a2") > F.col("a1")) & (F.col("b2") < F.col("b1")), prod)
        ).alias("d"),
        F.sum(
            F.when((F.col("a2") > F.col("a1")) & (F.col("b2") == F.col("b1")), prod)
        ).alias("ty"),
        F.sum(
            F.when((F.col("a2") == F.col("a1")) & (F.col("b2") > F.col("b1")), prod)
        ).alias("tx"),
    )


@register("ordinal_gamma_somers", oracle=GAMMA_SQL, covers=["A2", "J1"])
def q_ordinal_gamma_somers(spark, sf_dir):
    """Goodman–Kruskal gamma and Somers' d_yx between order priority
    (ordinal 1..5, the leading digit) and order quarter (ordinal 1..4)
    — the ordinal-vs-ordinal association pair of batch 95's Cramér's V.

    Concordant/discordant/tied pair counts come from the CONTINGENCY
    CELLS: summing n1*n2 over ordered cell pairs with a2 > a1 counts
    every unordered row pair exactly once, so C, D, T_x, T_y are exact
    integers (HUGEINT/DECIMAL(38)) with zero row-pair joins. gamma =
    (C-D)/(C+D); Somers' d_yx = (C-D)/(C+D+T_y) (quarter dependent —
    the convention dividing by pairs untied on x).

    Scale: one keyed count over the fact table; the cell cross join is
    20 x 20 rows forever."""
    conc = _cells_and_conc(spark, sf_dir)
    cmd = (F.col("c") - F.col("d")).cast("double")
    return conc.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.col("tx").cast("long").alias("tied_x_only"),
        F.col("ty").cast("long").alias("tied_y_only"),
        F.round(cmd / (F.col("c") + F.col("d")).cast("double"), 6).alias("gamma"),
        F.round(
            cmd / (F.col("c") + F.col("d") + F.col("ty")).cast("double"), 6
        ).alias("somers_d_yx"),
    )


TAUB_SQL = (
    "WITH "
    + _CELLS_CTE
    + """,
tot AS (
    SELECT SUM(n) AS n,
           SUM(CAST(n AS HUGEINT) * (n - 1) / 2) AS tie_both
    FROM cells
),
margx AS (
    SELECT SUM(CAST(tn AS HUGEINT) * (tn - 1) / 2) AS n1
    FROM (SELECT SUM(n) AS tn FROM cells GROUP BY a)
),
margy AS (
    SELECT SUM(CAST(tn AS HUGEINT) * (tn - 1) / 2) AS n2
    FROM (SELECT SUM(n) AS tn FROM cells GROUP BY b)
)
SELECT CAST(tot.n AS BIGINT) AS n,
       CAST(conc.c AS BIGINT) AS concordant,
       CAST(conc.d AS BIGINT) AS discordant,
       round(CAST(conc.c - conc.d AS DOUBLE)
             / (sqrt(CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) / 2 - margx.n1
                          AS DOUBLE))
                * sqrt(CAST(CAST(tot.n AS HUGEINT) * (tot.n - 1) / 2 - margy.n2
                            AS DOUBLE))), 6) AS tau_b
FROM conc, tot, margx, margy
"""
)


@register("kendall_tau_b", oracle=TAUB_SQL, covers=["A2", "J1"])
def q_kendall_tau_b(spark, sf_dir):
    """Kendall tau-b for the same priority x quarter ordinals:
    tau_b = (C-D) / sqrt((n0-n1)(n0-n2)) with n0 = n(n-1)/2 and n1/n2
    the marginal tie-pair counts — the tie-adjusted rank concordance
    coefficient.

    C/D from the cell cross join (exact, see ordinal_gamma_somers);
    n0/n1/n2 exact integers from the marginals; the denominator is
    evaluated as sqrt(a)*sqrt(b) — identical form both engines — so the
    only rounding is the final IEEE sqrt/divide."""
    conc = _cells_and_conc(spark, sf_dir)
    cells = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("a"),
            F.quarter("o_orderdate").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dec = lambda c: c.cast("decimal(38,0)")
    tot = cells.agg(F.sum("n").alias("n"))
    margx = (
        cells.groupBy("a")
        .agg(F.sum("n").alias("tn"))
        .agg(F.sum(dec(F.col("tn")) * (F.col("tn") - 1) / 2).alias("n1"))
    )
    margy = (
        cells.groupBy("b")
        .agg(F.sum("n").alias("tn"))
        .agg(F.sum(dec(F.col("tn")) * (F.col("tn") - 1) / 2).alias("n2"))
    )
    n0 = dec(F.col("n")) * (F.col("n") - 1) / 2
    return (
        conc.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(margx))
        .crossJoin(F.broadcast(margy))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("c").cast("long").alias("concordant"),
            F.col("d").cast("long").alias("discordant"),
            F.round(
                (F.col("c") - F.col("d")).cast("double")
                / (
                    F.sqrt((n0 - F.col("n1")).cast("double"))
                    * F.sqrt((n0 - F.col("n2")).cast("double"))
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# 6. Brown–Forsythe robust ANOVA (median-centered Levene test).

BROWNFORSYTHE_SQL = """
WITH v AS (
    SELECT event_type AS g, CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events WHERE value IS NOT NULL
),
gc AS (SELECT g, v6, COUNT(*) AS c FROM v GROUP BY g, v6),
cum AS (
    SELECT g, v6, c,
           SUM(c) OVER (PARTITION BY g ORDER BY v6
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
           SUM(c) OVER (PARTITION BY g) AS ng
    FROM gc
),
med AS (
    -- nearest-rank-lower median: smallest v6 whose running count
    -- reaches ceil((ng+1)/2) rounded DOWN = (ng+1)//2
    SELECT g, MIN(v6) AS med
    FROM cum WHERE cum >= (ng + 1) // 2 GROUP BY g
),
z AS (
    SELECT v.g, abs(v.v6 - med.med) AS z6
    FROM v JOIN med ON med.g = v.g
),
grp AS (
    SELECT g, COUNT(*) AS ni, SUM(z6) AS si,
           SUM(CAST(z6 AS HUGEINT) * z6) AS qi
    FROM z GROUP BY g
),
tot AS (
    SELECT COUNT(*) AS k, SUM(ni) AS n, SUM(si) AS s, SUM(qi) AS q FROM grp
),
terms AS (
    SELECT list_reduce(
               list(CAST(CAST(si AS HUGEINT) * si AS DOUBLE) / CAST(ni AS DOUBLE)
                    ORDER BY g),
               (x, y) -> x + y) AS sum_sq_over_n
    FROM grp
)
SELECT CAST(tot.k AS INT) AS k,
       CAST(tot.n AS BIGINT) AS n,
       round(((terms.sum_sq_over_n
               - CAST(CAST(tot.s AS HUGEINT) * tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
              / CAST(tot.k - 1 AS DOUBLE))
             / ((CAST(tot.q AS DOUBLE) - terms.sum_sq_over_n)
                / CAST(tot.n - tot.k AS DOUBLE)), 6) AS f_stat
FROM tot, terms
"""


@register("brown_forsythe_f", oracle=BROWNFORSYTHE_SQL, covers=["A2", "O6"])
def q_brown_forsythe_f(spark, sf_dir):
    """Brown–Forsythe variance-homogeneity test: one-way ANOVA F on
    z_ij = |x_ij - median_i| — the robust Levene variant that guards
    batch 95's anova_f_oneway (whose F assumes equal variances).

    The per-group median is nearest-rank-lower over exact micro-integer
    values, computed from per-distinct-value counts with a PARTITIONED
    running sum (no global window, no per-row ranking); z is then an
    exact integer and the F reuses the exact sufficient-statistics
    fold of anova_f_oneway (`q_pipeline95.py`)."""
    from prosnet_prefect_pipelines_spark.model import read_events

    v = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
        )
    )
    gc = v.groupBy("g", "v6").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("v6")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gc.select(
        "g",
        "v6",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("ng"),
    )
    med = (
        cum.filter(F.col("cum") >= F.expr("(ng + 1) div 2"))
        .groupBy("g")
        .agg(F.min("v6").alias("med"))
    )
    z = v.join(med, on="g").select(
        "g", F.abs(F.col("v6") - F.col("med")).alias("z6")
    )
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("z6").alias("si"),
        F.sum(F.col("z6").cast("decimal(19,0)") * F.col("z6").cast("decimal(19,0)")).alias("qi"),
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
                        F.col("g").alias("g"),
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
        F.round(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
    )
