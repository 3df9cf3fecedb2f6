"""Pipeline batch 79 (north-star extension): nonparametric statistics,
exactly — Kolmogorov-Smirnov via cross-multiplied ECDFs, Mann-Whitney U
with doubled tie ranks, Spearman rank correlation as integer Pearson on
ranks, the Wald-Wolfowitz runs test, and a paired sign test.

Every statistic that classically needs fractions is rescaled to stay in
integers: ECDF differences cross-multiply (|i*m - j*n|), average ranks
double (2r is always integral), Spearman reuses the (sign, r² ppm)
decomposition — so both engines agree bit-for-bit with no float ever."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.distrank import (
    prefix_sums,
)
from prosnet_prefect_pipelines_spark.plans.catalog import register

# r11: the distinct-value cumulations here route through the
# distributed two-pass prefix sum (operators/distrank.py) — the
# distinct-value tables are value-cardinality and the old
# single-partition windows were latent scale cliffs. Bit-identical.

# Two samples throughout: order values before/after 1996-01-01.
_SAMPLES_CTE = """
s AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
           CASE WHEN CAST(o_orderdate AS DATE) < DATE '1996-01-01'
                THEN 1 ELSE 2 END AS grp
    FROM orders
)
"""


def _samples(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(
            F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date"), 1
        )
        .otherwise(2)
        .alias("grp"),
    )


# ---------------------------------------------------------------------------
# exact two-sample Kolmogorov-Smirnov statistic.

KS_SQL = f"""
WITH {_SAMPLES_CTE},
n AS (
    SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
           SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS n2
    FROM s
),
merged AS (
    SELECT v,
           SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) OVER
               (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
           SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) OVER
               (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2,
           row_number() OVER (ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY v) AS dup,
           row_number() OVER (PARTITION BY v ORDER BY grp) AS dup_rn
    FROM s
),
at_value AS (
    -- evaluate the ECDF step only at the LAST row of each tied value
    SELECT c1, c2 FROM merged WHERE dup_rn = dup
),
d AS (
    SELECT MAX(abs(CAST(c1 AS HUGEINT) * n.n2 - CAST(c2 AS HUGEINT) * n.n1))
               AS dnum
    FROM at_value CROSS JOIN n
)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       CAST(d.dnum AS BIGINT) AS ks_numerator,
       CAST(CAST(d.dnum AS HUGEINT) * 1000000
            // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT) AS ks_micro
FROM d CROSS JOIN n
"""


@register("ks_statistic_exact", oracle=KS_SQL, covers=["A2", "O1"])
def q_ks_statistic_exact(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov: D = max |F1(v) - F2(v)|
    evaluated WITHOUT fractions — the ECDF difference cross-multiplies
    to |c1*n2 - c2*n1| (over n1*n2), the step evaluated at the last row
    of each tied value. One merged-order window pass; the distribution-
    drift gate that needs no binning choices (vs PSI's fixed bins)."""
    s = _samples(spark, sf_dir)
    # |V|-bound convention (r5 verdict item 4): aggregate to the
    # per-distinct-value count table FIRST, so the unpartitioned
    # cumulative window runs over |V| distinct prices, never raw order
    # rows (the original formulation windowed the raw table). The ECDF
    # step at each distinct value equals the old last-tie-row (c1, c2)
    # exactly; where |V| is data-sized the pre-bucketed drift gates
    # (psi_drift / q_pipeline110's TVD) are the scale path.
    per_v = s.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).alias("a2"),
    )
    n = per_v.agg(
        F.sum("a1").alias("n1"),
        F.sum("a2").alias("n2"),
    )
    cum = prefix_sums(
        per_v, [F.col("v").asc()], {"c1": F.col("a1"), "c2": F.col("a2")}
    )
    at_value = cum.select("c1", "c2")
    d = at_value.join(F.broadcast(n)).agg(
        F.max(
            F.abs(
                F.col("c1").cast("decimal(38,0)") * F.col("n2")
                - F.col("c2").cast("decimal(38,0)") * F.col("n1")
            )
        ).alias("dnum")
    )
    return d.join(F.broadcast(n)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("dnum").cast("long").alias("ks_numerator"),
        F.expr(
            "CAST(CAST(dnum AS DECIMAL(38,0)) * 1000000 div "
            "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("ks_micro"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U with tie-corrected (doubled) ranks.

MWU_SQL = f"""
WITH {_SAMPLES_CTE},
r AS (
    -- doubled average rank: 2*avg_rank = rank() + (rank of last tie)
    -- = 2*rank(v) + ties(v) - 1, always an integer
    SELECT grp,
           2 * rank() OVER (ORDER BY v) + COUNT(*) OVER (PARTITION BY v) - 1
               AS r2
    FROM s
),
n AS (
    SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
           SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS n2
    FROM s
),
rs AS (SELECT SUM(CASE WHEN grp = 1 THEN r2 ELSE 0 END) AS r2sum1 FROM r)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       CAST(rs.r2sum1 AS BIGINT) AS rank2_sum_1,
       -- 2*U1 = 2*R1 - n1*(n1+1)
       CAST(rs.r2sum1 - CAST(n.n1 AS HUGEINT) * (n.n1 + 1) AS BIGINT) AS u1_x2,
       CAST(2 * CAST(n.n1 AS HUGEINT) * n.n2
            - (rs.r2sum1 - CAST(n.n1 AS HUGEINT) * (n.n1 + 1)) AS BIGINT)
           AS u2_x2
FROM n CROSS JOIN rs
"""


@register("mannwhitney_u_exact", oracle=MWU_SQL, covers=["A2", "O1"])
def q_mannwhitney_u_exact(spark, sf_dir):
    """Exact Mann-Whitney U (rank-sum) with ties: the average rank is
    kept integral by doubling (2*avg_rank = 2*rank + ties - 1), so
    2*U1 = 2*R1 - n1(n1+1) is exact integer arithmetic — the
    nonparametric A/B test for ordinal shifts, with U1 + U2 = n1*n2
    as the built-in invariant (asserted in pytest)."""
    s = _samples(spark, sf_dir)
    # |V|-bound convention: ranks come from per-distinct-value counts,
    # not a raw-row rank window. With cnt(v) rows of value v and
    # tot(v) the cumulative count through v, rank(v) = tot(v) -
    # cnt(v) + 1, so the doubled tie rank 2*rank + cnt - 1 collapses
    # to 2*tot(v) - cnt(v) + 1 and the group-1 rank sum is one
    # weighted aggregate over the distinct-value table.
    per_v = s.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).alias("a2"),
    )
    cum = prefix_sums(
        per_v, [F.col("v").asc()], {"tot": F.col("a1") + F.col("a2")}
    )
    cum = cum.select(
        "a1", (F.col("a1") + F.col("a2")).alias("cnt"), "tot"
    )
    n = per_v.agg(
        F.sum("a1").alias("n1"),
        F.sum("a2").alias("n2"),
    )
    rs = cum.agg(
        F.sum(
            F.col("a1") * (2 * F.col("tot") - F.col("cnt") + 1)
        ).alias("r2sum1")
    )
    return n.join(rs).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("r2sum1").cast("long").alias("rank2_sum_1"),
        F.expr(
            "CAST(r2sum1 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS BIGINT)"
        ).alias("u1_x2"),
        F.expr(
            "CAST(2 * CAST(n1 AS DECIMAL(38,0)) * n2 - "
            "(r2sum1 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) AS BIGINT)"
        ).alias("u2_x2"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation as integer Pearson on doubled ranks.

SPEARMAN_SQL = """
WITH pts AS (
    SELECT CAST(round(l_quantity) AS BIGINT) AS x,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem WHERE l_partkey % 50 = 0
),
r AS (
    SELECT 2 * rank() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1
               AS rx,
           2 * rank() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1
               AS ry
    FROM pts
),
s AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(rx) AS HUGEINT) AS sx, CAST(SUM(ry) AS HUGEINT) AS sy,
           CAST(SUM(rx * ry) AS HUGEINT) AS sxy,
           CAST(SUM(rx * rx) AS HUGEINT) AS sxx,
           CAST(SUM(ry * ry) AS HUGEINT) AS syy
    FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                 WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INT)
           AS rho_sign,
       CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
            // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)
           AS rho2_ppm
FROM s
"""


@register("spearman_rank_corr", oracle=SPEARMAN_SQL, covers=["A2", "O1"])
def q_spearman_rank_corr(spark, sf_dir):
    """Exact Spearman correlation: Pearson computed on tie-corrected
    DOUBLED ranks (integral average ranks), emitted as the (sign,
    rho² ppm) decomposition — monotonic association with zero floats,
    correct under ties where the classic 6Σd² shortcut is not."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_partkey") % 50 == 0
    )
    pts = li.select(
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    # |V|-bound convention: the doubled rank of value v depends only on
    # per-distinct-value counts (2*rank + ties - 1 = 2*tot(v) - cnt(v)
    # + 1, as in mannwhitney_u_exact), so rank BOTH axes over their
    # distinct-value tables, then attach ranks to the (x, y) PAIR
    # count table by two joins (rank tables are value-distinct —
    # broadcastable here) and fold the Pearson sums as pair-weighted
    # aggregates. No window touches raw rows; where |V_y| (distinct
    # cents) is data-sized, the monthly-bucketed
    # spearman_rho_price_recency is the scale path.
    pairs = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))

    def _ranks(col: str, out: str):
        per_v = pairs.groupBy(col).agg(F.sum("c").alias("cnt"))
        cum = prefix_sums(
            per_v, [F.col(col).asc()], {"_ci": F.col("cnt")}
        )
        return cum.select(
            col, (2 * F.col("_ci") - F.col("cnt") + 1).alias(out)
        )

    # rank-table joins left to AQE (broadcast while small; the rank
    # tables are value-cardinality, so a forced broadcast was the
    # same latent cliff as the windows)
    r = pairs.join(_ranks("x", "rx"), "x").join(_ranks("y", "ry"), "y")
    d = "DECIMAL(38,0)"
    s = r.agg(
        F.sum("c").cast(d).alias("n"),
        F.sum(F.col("c") * F.col("rx")).cast(d).alias("sx"),
        F.sum(F.col("c") * F.col("ry")).cast(d).alias("sy"),
        F.sum(F.col("c") * F.col("rx") * F.col("ry")).cast(d).alias("sxy"),
        F.sum(F.col("c") * F.col("rx") * F.col("rx")).cast(d).alias("sxx"),
        F.sum(F.col("c") * F.col("ry") * F.col("ry")).cast(d).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).cast("int").alias(
            "rho_sign"
        ),
        F.expr(
            "CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000 div "
            "((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)"
        ).alias("rho2_ppm"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test counts.

RUNS_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
    FROM events GROUP BY day
),
med AS (
    -- exact lower median by position over the bounded daily series
    SELECT n AS m FROM (
        SELECT n, row_number() OVER (ORDER BY n, day) AS rn,
               COUNT(*) OVER () AS cnt
        FROM daily
    ) t WHERE rn = (cnt + 1) // 2
),
signs AS (
    SELECT day, CASE WHEN d.n > m.m THEN 1 ELSE 0 END AS above
    FROM daily d CROSS JOIN med m
),
flips AS (
    SELECT above,
           CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                     OR lag(above) OVER (ORDER BY day) <> above
                THEN 1 ELSE 0 END AS new_run
    FROM signs
)
SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
       CAST(SUM(above) AS BIGINT) AS n_above,
       CAST(SUM(1 - above) AS BIGINT) AS n_not_above
FROM flips
"""


@register("runs_test_exact", oracle=RUNS_SQL, covers=["A2", "O1"])
def q_runs_test_exact(spark, sf_dir):
    """Wald-Wolfowitz runs test counts: the daily event series signed
    against its exact positional median, runs counted as sign flips —
    too FEW runs = trending/clustered, too MANY = oscillating; the
    counts feed the normal approximation downstream. All windows run
    over the bounded daily series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wm = Window.orderBy("n", "day")
    wall = Window.partitionBy()
    med = (
        daily.select(
            "n",
            F.row_number().over(wm).alias("rn"),
            F.count(F.lit(1)).over(wall).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(F.col("n").alias("m"))
    )
    signs = daily.join(F.broadcast(med)).select(
        "day", F.when(F.col("n") > F.col("m"), 1).otherwise(0).alias("above")
    )
    wd = Window.orderBy("day")
    flips = signs.select(
        "above",
        F.when(
            F.lag("above").over(wd).isNull()
            | (F.lag("above").over(wd) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    return flips.agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        F.sum("above").cast("long").alias("n_above"),
        F.sum(1 - F.col("above")).cast("long").alias("n_not_above"),
    )


# ---------------------------------------------------------------------------
# paired sign test over consecutive months.

SIGN_SQL = """
WITH rev AS (
    SELECT c.c_nationkey AS nation,
           strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY nation, month
),
pairs AS (
    SELECT nation, cents,
           lag(cents) OVER (PARTITION BY nation ORDER BY month) AS prev
    FROM rev
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(SUM(CASE WHEN cents > prev THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN cents < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(SUM(CASE WHEN cents = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
FROM pairs WHERE prev IS NOT NULL
GROUP BY nation
"""


@register("sign_test_counts", oracle=SIGN_SQL, covers=["A2", "O1"])
def q_sign_test_counts(spark, sf_dir):
    """Paired sign test: month-over-month revenue direction counts per
    nation (up / down / tie) — the distribution-free trend test whose
    binomial p-value needs only these integers. One rollup + a
    per-nation lag window over the bounded month series."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nation")
    )
    rev = (
        orders.select(
            "o_custkey",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "month")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy("month")
    pairs = rev.select(
        "nation", "cents", F.lag("cents").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return pairs.groupBy("nation").agg(
        F.sum(F.when(F.col("cents") > F.col("prev"), 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("cents") < F.col("prev"), 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum(F.when(F.col("cents") == F.col("prev"), 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
    ).select(
        F.col("nation").cast("long").alias("nation"), "n_up", "n_down", "n_tie"
    )
