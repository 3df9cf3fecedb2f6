"""Pipeline batch 110 (north-star extension): distribution
distances, exactly — Wasserstein-1 (earth mover's), two-sample
Cramér-von Mises, the energy distance and total variation over
bins, all between returned and kept order-value distributions.
These are the drift/shift measures a training-data pipeline uses to
compare splits, cohorts and time periods — here in EXACT integer
ECDF arithmetic instead of the usual sampled approximations.

The two samples are X = order values (cents) of orders with any
returned lineitem, Y = the rest (the batch-105 labeling).

Exactness conventions (the batch-96 distinct-value discipline):
- all four statistics reduce to the distinct-value table with
  per-group cumulative counts (and cumulative sums for the energy
  distance); ECDF differences scale to the integer
  d_v = cc1_v*n2 - cc2_v*n1, so
  W1   = sum |d_v| * gap_v / (n1*n2),
  CvM  = (sum m_v * d_v^2) / (N^2 * n1 * n2),
  TVD  = sum_bins |c1*n2 - c2*n1| / (2*n1*n2)
  have EXACT integer numerators (DECIMAL(38,0)/HUGEINT);
- pairwise-absolute-difference sums use the sorted prefix identity
  sum_{pairs} |a - b| = sum_v mult_v * (cnt_lt_v * v - sum_lt_v) —
  never a pair join;
- one double division per statistic, 6 dp.

Scale notes: one orders-lineitem aggregation keyed on l_orderkey,
then ONE keyed aggregation to the distinct-value table; the
cumulative windows run over |V| (distinct prices), which
pre-bucketing shrinks at will (the TVD query shows the 10-bin
version). No pair joins anywhere — the O(n^2) pairwise sums are
closed-form prefix identities.

Ref semantics: SURVEY §2 A2/O1 compositions; no reference
counterpart (extensions X-WASSERSTEIN .. X-TVD).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.distrank import (
    prefix_sums,
)
from prosnet_prefect_pipelines_spark.plans.catalog import register

# r11: every cumulation here runs over the |V| distinct-order-value
# table — value-cardinality, corpus-growing — so the single-partition
# windows route through the distributed two-pass prefix sum
# (operators/distrank.py); the lead() becomes a rank self-join. All
# bit-identical (exact integer/decimal cumulation).

# labeled order values -> distinct-value table with per-group counts
_VALS_SQL = """
labeled AS (
    SELECT o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
           MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
vals AS (
    SELECT x, SUM(y) AS c1, SUM(1 - y) AS c2 FROM labeled GROUP BY x
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM vals)
"""


def _vals(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    labeled = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "x")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("y"))
    )
    return labeled.groupBy("x").agg(
        F.sum("y").alias("c1"), F.sum(1 - F.col("y")).alias("c2")
    )


# ---------------------------------------------------------------------------
# 1. Wasserstein-1 (earth mover's distance).

WASSERSTEIN_SQL = (
    "WITH "
    + _VALS_SQL
    + """,
cum AS (
    SELECT x,
           SUM(c1) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cc1,
           SUM(c2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cc2,
           LEAD(x) OVER (ORDER BY x) AS nx
    FROM vals
),
num AS (
    SELECT SUM(abs(CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1)
               * (nx - x)) AS w
    FROM cum CROSS JOIN tot WHERE nx IS NOT NULL
)
SELECT (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_returned,
       (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_kept,
       round(CAST(COALESCE(w, 0) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2) / 100.0, 6)
           AS wasserstein1_dollars_6
FROM num CROSS JOIN tot
"""
)


@register("wasserstein1_returns", oracle=WASSERSTEIN_SQL, covers=["A2", "O1", "J1"])
def q_wasserstein1_returns(spark, sf_dir):
    """Exact Wasserstein-1 distance between returned and kept order
    values: integral of |ECDF1 - ECDF2| as the sum over consecutive
    distinct values of |cc1*n2 - cc2*n1| * gap — an exact integer
    numerator divided once by n1*n2 (and 100 for dollars). One
    cumulative window over the |V| distinct-value table; no pair
    join.

    Ref semantics: SURVEY §2 A2/O1 (extension X-WASSERSTEIN)."""
    vals = _vals(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = prefix_sums(
        vals, [F.col("x").asc()],
        {"cc1": F.col("c1"), "cc2": F.col("c2")}, rn_out="_rn",
    )
    # lead(x) as a rank self-join: row _rn's next value is row _rn+1's
    # x (null for the last row, exactly like lead's default)
    nxt = cum.select((F.col("_rn") - 1).alias("_rn"), F.col("x").alias("nx"))
    cum = cum.join(nxt, on="_rn", how="left").select("x", "cc1", "cc2", "nx")
    num = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nx").isNotNull())
        .agg(
            F.sum(
                F.abs(dec(F.col("cc1")) * F.col("n2") - dec(F.col("cc2")) * F.col("n1"))
                * (F.col("nx") - F.col("x"))
            ).alias("w")
        )
    )
    return num.crossJoin(F.broadcast(tot)).select(
        F.col("n1").cast("long").alias("n_returned"),
        F.col("n2").cast("long").alias("n_kept"),
        # a single distinct pooled value leaves no (x, next-x) gap rows:
        # the empty SUM is NULL, but the distance is exactly 0 (both
        # sides coalesce identically; oracle hash unchanged on any
        # corpus with >= 2 distinct order values)
        F.round(
            F.coalesce(F.col("w"), F.lit(0)).cast("double")
            / (F.col("n1").cast("double") * F.col("n2"))
            / 100.0,
            6,
        ).alias("wasserstein1_dollars_6"),
    )


# ---------------------------------------------------------------------------
# 2. Two-sample Cramér-von Mises statistic.

CVM_SQL = (
    "WITH "
    + _VALS_SQL
    + """,
cum AS (
    SELECT x, c1 + c2 AS m,
           SUM(c1) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cc1,
           SUM(c2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cc2
    FROM vals
),
num AS (
    SELECT SUM(CAST(m AS HUGEINT)
               * (CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1)
               * (CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1))
               AS s
    FROM cum CROSS JOIN tot
)
SELECT (SELECT CAST(n1 + n2 AS BIGINT) FROM tot) AS n_pooled,
       round(CAST(s AS DOUBLE)
             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * n1 * n2), 6)
           AS cvm_t_6
FROM num CROSS JOIN tot
"""
)


@register("cvm_two_sample", oracle=CVM_SQL, covers=["A2", "O1"])
def q_cvm_two_sample(spark, sf_dir):
    """Two-sample Cramér-von Mises T = (n1*n2/N^2) * sum over pooled
    observations of (F1 - F2)^2, tie-correct by weighting each
    distinct value with its pooled multiplicity: the numerator
    sum m_v * (cc1*n2 - cc2*n1)^2 is an exact DECIMAL(38,0) integer,
    divided once by N^2*n1*n2. Same |V|-window shape as Wasserstein.

    Ref semantics: SURVEY §2 A2/O1 (extension X-CVM)."""
    vals = _vals(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = prefix_sums(
        vals, [F.col("x").asc()], {"cc1": F.col("c1"), "cc2": F.col("c2")}
    )
    cum = cum.select(
        (F.col("c1") + F.col("c2")).alias("m"), "cc1", "cc2"
    )
    d = dec(F.col("cc1")) * F.col("n2") - dec(F.col("cc2")) * F.col("n1")
    num = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(dec(F.col("m")) * d * d).alias("s")
    )
    nd = lambda c: c.cast("double")  # noqa: E731
    return num.crossJoin(F.broadcast(tot)).select(
        (F.col("n1") + F.col("n2")).cast("long").alias("n_pooled"),
        F.round(
            F.col("s").cast("double")
            / (
                nd(F.col("n1") + F.col("n2"))
                * (F.col("n1") + F.col("n2"))
                * F.col("n1")
                * F.col("n2")
            ),
            6,
        ).alias("cvm_t_6"),
    )


# ---------------------------------------------------------------------------
# 3. Energy distance via sorted prefix identities (no pair joins).

ENERGY_SQL = (
    "WITH "
    + _VALS_SQL
    + """,
cum AS (
    SELECT x, c1, c2,
           COALESCE(SUM(c1) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING), 0) AS lt1,
           COALESCE(SUM(CAST(c1 AS HUGEINT) * x) OVER (ORDER BY x ROWS
                    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ls1,
           COALESCE(SUM(c2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING), 0) AS lt2,
           COALESCE(SUM(CAST(c2 AS HUGEINT) * x) OVER (ORDER BY x ROWS
                    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ls2
    FROM vals
),
sums AS (
    SELECT SUM(CAST(c1 AS HUGEINT) * (CAST(lt2 AS HUGEINT) * x - ls2)
               + CAST(c2 AS HUGEINT) * (CAST(lt1 AS HUGEINT) * x - ls1))
               AS sxy,
           SUM(CAST(c1 AS HUGEINT) * (CAST(lt1 AS HUGEINT) * x - ls1))
               AS sxx,
           SUM(CAST(c2 AS HUGEINT) * (CAST(lt2 AS HUGEINT) * x - ls2))
               AS syy
    FROM cum
)
SELECT (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_returned,
       (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_kept,
       round(CAST(sxy AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) / 100.0, 6)
           AS mean_cross_dist_dollars_6,
       round(2.0 * CAST(sxx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)
             / 100.0, 6) AS mean_within_x_dollars_6,
       round(2.0 * CAST(syy AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2)
             / 100.0, 6) AS mean_within_y_dollars_6,
       round((2.0 * CAST(sxy AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
              - 2.0 * CAST(sxx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)
              - 2.0 * CAST(syy AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2))
             / 100.0, 6) AS energy_distance_dollars_6
FROM sums CROSS JOIN tot
"""
)


@register("energy_distance_returns", oracle=ENERGY_SQL, covers=["A2", "O1"])
def q_energy_distance_returns(spark, sf_dir):
    """Energy distance E = 2*E|X-Y| - E|X-X'| - E|Y-Y'| between
    returned and kept order values — every pairwise-absolute-sum is
    the sorted prefix identity sum_v mult_v*(cnt_lt*v - sum_lt), an
    exact integer, so the O(n^2) pair space never materializes. One
    cumulative window (counts + sums) over the |V| table.

    Ref semantics: SURVEY §2 A2/O1 (extension X-ENERGY)."""
    vals = _vals(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    # strict prefixes via inclusive - own term; the weighted sums
    # cumulate as DECIMAL(38,0) (c*x products overflow a long at scale)
    cum = prefix_sums(
        vals, [F.col("x").asc()],
        {
            "_le1": F.col("c1"),
            "_lse1": (dec(F.col("c1")) * F.col("x"), "decimal(38,0)"),
            "_le2": F.col("c2"),
            "_lse2": (dec(F.col("c2")) * F.col("x"), "decimal(38,0)"),
        },
    )
    cum = cum.select(
        F.col("x"),
        F.col("c1"),
        F.col("c2"),
        (F.col("_le1") - F.col("c1")).alias("lt1"),
        (F.col("_lse1") - dec(F.col("c1")) * F.col("x")).alias("ls1"),
        (F.col("_le2") - F.col("c2")).alias("lt2"),
        (F.col("_lse2") - dec(F.col("c2")) * F.col("x")).alias("ls2"),
    )
    sxy = F.sum(
        dec(F.col("c1")) * (dec(F.col("lt2")) * F.col("x") - F.col("ls2"))
        + dec(F.col("c2")) * (dec(F.col("lt1")) * F.col("x") - F.col("ls1"))
    )
    sxx = F.sum(dec(F.col("c1")) * (dec(F.col("lt1")) * F.col("x") - F.col("ls1")))
    syy = F.sum(dec(F.col("c2")) * (dec(F.col("lt2")) * F.col("x") - F.col("ls2")))
    sums = cum.agg(sxy.alias("sxy"), sxx.alias("sxx"), syy.alias("syy"))
    j = sums.crossJoin(F.broadcast(tot))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    a = F.col("sxy").cast("double") / (n1d * F.col("n2"))
    b = 2.0 * F.col("sxx").cast("double") / (n1d * F.col("n1"))
    c = 2.0 * F.col("syy").cast("double") / (n2d * F.col("n2"))
    return j.select(
        F.col("n1").cast("long").alias("n_returned"),
        F.col("n2").cast("long").alias("n_kept"),
        F.round(a / 100.0, 6).alias("mean_cross_dist_dollars_6"),
        F.round(b / 100.0, 6).alias("mean_within_x_dollars_6"),
        F.round(c / 100.0, 6).alias("mean_within_y_dollars_6"),
        F.round((2.0 * a - b - c) / 100.0, 6).alias(
            "energy_distance_dollars_6"
        ),
    )


# ---------------------------------------------------------------------------
# 4. Total variation distance over 10 equal-width bins.

TVD_SQL = (
    "WITH "
    + _VALS_SQL
    + """,
rng AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM vals),
bins AS (
    SELECT LEAST(9, CAST((v.x - rng.mn) * 10 AS HUGEINT)
                    // (rng.mx - rng.mn + 1)) AS b,
           SUM(c1) AS c1, SUM(c2) AS c2
    FROM vals v CROSS JOIN rng
    GROUP BY 1
),
num AS (
    SELECT SUM(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
               AS s,
           MAX(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
               AS mx_d
    FROM bins CROSS JOIN tot
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bins) AS bins_present,
       round(CAST(s AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * n2), 6)
           AS tvd_6,
       (SELECT CAST(MIN(b) AS BIGINT) FROM bins CROSS JOIN tot
        WHERE abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
              = (SELECT mx_d FROM num)) AS max_divergence_bin
FROM num CROSS JOIN tot
"""
)


@register("tvd_decile_bins", oracle=TVD_SQL, covers=["A2", "P2"])
def q_tvd_decile_bins(spark, sf_dir):
    """Total variation distance between the two distributions over 10
    equal-width value bins: TVD = sum |c1*n2 - c2*n1| / (2*n1*n2) —
    exact integer numerator — plus the most-divergent bin (min bin id
    on ties). Binning uses exact integer arithmetic
    (x - min)*10 div (max - min + 1), identical truncation both
    engines on non-negative operands.

    Ref semantics: SURVEY §2 A2/P2 (extension X-TVD)."""
    vals = _vals(spark, sf_dir)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    rng = vals.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # integer division on non-negative longs: Spark `div` truncates
    # toward zero == DuckDB `//` floor for non-negative operands
    b = F.expr("least(9L, ((x - mn) * 10) div (mx - mn + 1))")
    bins = (
        vals.crossJoin(F.broadcast(rng))
        .groupBy(b.alias("b"))
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    )
    d = F.abs(dec(F.col("c1")) * F.col("n2") - dec(F.col("c2")) * F.col("n1"))
    jb = bins.crossJoin(F.broadcast(tot)).select(
        F.col("b"), d.alias("d"), F.col("n1"), F.col("n2")
    )
    agg = jb.agg(
        F.count(F.lit(1)).alias("bins_present"),
        F.sum("d").alias("s"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.min_by(F.col("b"), F.struct((-F.col("d")).alias("nd"), F.col("b"))).alias(
            "max_divergence_bin"
        ),
    )
    return agg.select(
        F.col("bins_present").cast("long").alias("bins_present"),
        F.round(
            F.col("s").cast("double")
            / (2.0 * F.col("n1").cast("double") * F.col("n2")),
            6,
        ).alias("tvd_6"),
        F.col("max_divergence_bin").cast("long").alias("max_divergence_bin"),
    )
