"""Pipeline batch 111 (north-star extension): privacy risk metrics
round 2 — l-diversity, t-closeness, uniqueness risk and the
homogeneity-attack screen, completing the k-anonymity audit from
batch 10. These are the re-identification risk reports a pipeline
runs before releasing a quasi-identified extract.

Quasi-identifier (QI) = (customer nation, order year); sensitive
attribute = order priority.

Exactness conventions:
- l (distinct sensitive values per QI group) and every k-histogram
  cell are exact integers;
- per-group entropy l-diversity uses the scaled-BIGINT term sum
  (round -p*ln(p) to 6 dp, sum micro-units) then an integer-valued
  MIN — the char_entropy_filter discipline;
- t-closeness TVD per group keeps the integer numerator
  |c_gp*N - C_p*n_g| (DECIMAL(38,0)/HUGEINT) and divides once by
  2*n_g*N; the report's mean-t rounds per group then averages in
  scaled micro-units.

Scale notes: one orders-customer join (customer broadcast at dim
scale; co-partitioned at fact scale), one (QI, sensitive)-keyed
count, then everything aggregates the |QI-groups| x |priorities|
cell table (~ 25 nations x 7 years x 5 priorities). The global
sensitive distribution is a 5-row broadcast.

Ref semantics: SURVEY §2 J1/A1/A2 compositions; no reference
counterpart (extensions X-LDIVERSITY .. X-HOMOGENEITY).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# (QI group, sensitive value) -> count
_CELLS_SQL = """
base AS (
    SELECT c.c_nationkey AS nat,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
           o.o_orderpriority AS sv
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
    SELECT nat, yr, sv, COUNT(*) AS c FROM base GROUP BY nat, yr, sv
),
grps AS (
    SELECT nat, yr, SUM(c) AS ng, COUNT(*) AS l, MAX(c) AS max_c
    FROM cells GROUP BY nat, yr
),
tot AS (SELECT SUM(c) AS n FROM cells)
"""


def _cells(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_orderpriority").alias("sv"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_nationkey").alias("nat")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("nat", "yr", "sv")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _grps(cells):
    return cells.groupBy("nat", "yr").agg(
        F.sum("c").alias("ng"),
        F.count(F.lit(1)).alias("l"),
        F.max("c").alias("max_c"),
    )


# ---------------------------------------------------------------------------
# 1. l-diversity report (distinct + entropy l-diversity).

LDIV_SQL = (
    "WITH "
    + _CELLS_SQL
    + """,
ent AS (
    SELECT nat, yr,
           SUM(CAST(round(round(-(c / CAST(ng AS DOUBLE))
                                * ln(c / CAST(ng AS DOUBLE)), 6)
                          * 1000000, 0) AS BIGINT)) AS h6
    FROM cells JOIN grps USING (nat, yr)
    GROUP BY nat, yr
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM grps) AS n_groups,
       (SELECT CAST(MIN(l) AS BIGINT) FROM grps) AS min_l,
       (SELECT round(CAST(SUM(CASE WHEN l >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) FROM grps) AS share_l_ge_2_6,
       (SELECT round(CAST(SUM(CASE WHEN l >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) FROM grps) AS share_l_ge_3_6,
       round(CAST(MIN(h6) AS BIGINT) / 1000000.0, 6) AS min_entropy_l_6
FROM ent
"""
)


@register("l_diversity_report", oracle=LDIV_SQL, covers=["J1", "A1", "A2"])
def q_l_diversity_report(spark, sf_dir):
    """l-diversity audit over (nation, year) quasi-identifier groups
    with order priority as the sensitive attribute: the minimum
    distinct-l, the share of groups meeting l >= 2 / l >= 3, and the
    minimum ENTROPY l-diversity (per-group Shannon entropy from 6-dp
    scaled terms — a group dominated by one value scores near 0 even
    when distinct-l looks fine).

    Ref semantics: SURVEY §2 J1/A1/A2 (extension X-LDIVERSITY)."""
    cells = _cells(spark, sf_dir)
    grps = _grps(cells)
    p = F.col("c").cast("double") / F.col("ng")
    t6 = F.round(F.round(-p * F.log(p), 6) * 1000000, 0).cast("long")
    ent = (
        cells.join(grps.select("nat", "yr", "ng"), ["nat", "yr"])
        .groupBy("nat", "yr")
        .agg(F.sum(t6).alias("h6"))
    )
    gagg = grps.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").alias("min_l"),
        F.round(
            F.sum((F.col("l") >= 2).cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("share_l_ge_2_6"),
        F.round(
            F.sum((F.col("l") >= 3).cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("share_l_ge_3_6"),
    )
    eagg = ent.agg(F.min("h6").alias("min_h6"))
    return gagg.crossJoin(F.broadcast(eagg)).select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("min_l").cast("long").alias("min_l"),
        F.col("share_l_ge_2_6"),
        F.col("share_l_ge_3_6"),
        F.round(F.col("min_h6") / 1000000.0, 6).alias("min_entropy_l_6"),
    )


# ---------------------------------------------------------------------------
# 2. t-closeness report (TVD to the global sensitive distribution).

TCLOSE_SQL = (
    "WITH "
    + _CELLS_SQL
    + """,
gdist AS (SELECT sv, SUM(c) AS gc FROM cells GROUP BY sv),
pair AS (
    SELECT g.nat, g.yr, g.ng,
           COALESCE(x.c, 0) AS c, d.gc, t.n
    FROM grps g
    CROSS JOIN gdist d
    CROSS JOIN tot t
    LEFT JOIN cells x ON x.nat = g.nat AND x.yr = g.yr AND x.sv = d.sv
),
tg AS (
    SELECT nat, yr,
           round(CAST(SUM(abs(CAST(c AS HUGEINT) * n
                              - CAST(gc AS HUGEINT) * ng)) AS DOUBLE)
                 / (2.0 * CAST(MAX(ng) AS DOUBLE) * MAX(n)), 6) AS t
    FROM pair GROUP BY nat, yr
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       round(MAX(t), 6) AS max_t_6,
       round(CAST(SUM(CAST(round(t * 1000000, 0) AS BIGINT)) AS BIGINT)
             / 1000000.0 / COUNT(*), 6) AS mean_t_6,
       CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_over_02
FROM tg
"""
)


@register("t_closeness_report", oracle=TCLOSE_SQL, covers=["J1", "J2", "A2"])
def q_t_closeness_report(spark, sf_dir):
    """t-closeness audit: per QI group, the total variation distance
    between the group's sensitive-value distribution and the global
    one — integer numerator |c*N - gc*ng| per cell, one division per
    group — reporting max t, the scaled-term mean t, and the count of
    groups breaching t > 0.2. Missing (group, value) cells enter as
    zeros via the left join (J2).

    Ref semantics: SURVEY §2 J1/J2/A2 (extension X-TCLOSENESS)."""
    cells = _cells(spark, sf_dir)
    grps = _grps(cells)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    gdist = cells.groupBy("sv").agg(F.sum("c").alias("gc"))
    tot = cells.agg(F.sum("c").alias("n"))
    pair = (
        grps.select("nat", "yr", "ng")
        .crossJoin(F.broadcast(gdist))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["nat", "yr", "sv"], "left")
        .select(
            "nat",
            "yr",
            "ng",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "gc",
            "n",
        )
    )
    tg = pair.groupBy("nat", "yr").agg(
        F.round(
            F.sum(
                F.abs(dec(F.col("c")) * F.col("n") - dec(F.col("gc")) * F.col("ng"))
            ).cast("double")
            / (2.0 * F.max("ng").cast("double") * F.max("n")),
            6,
        ).alias("t")
    )
    return tg.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(F.max("t"), 6).alias("max_t_6"),
        F.round(
            F.sum(F.round(F.col("t") * 1000000, 0).cast("long"))
            / 1000000.0
            / F.count(F.lit(1)),
            6,
        ).alias("mean_t_6"),
        F.sum((F.col("t") > 0.2).cast("int")).cast("long").alias(
            "groups_over_02"
        ),
    )


# ---------------------------------------------------------------------------
# 3. Uniqueness / k-level risk histogram.

UNIQUENESS_SQL = (
    "WITH "
    + _CELLS_SQL
    + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN ng = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS unique_groups,
       CAST(SUM(CASE WHEN ng BETWEEN 2 AND 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS k2_4_groups,
       CAST(SUM(CASE WHEN ng BETWEEN 5 AND 9 THEN 1 ELSE 0 END) AS BIGINT)
           AS k5_9_groups,
       CAST(SUM(CASE WHEN ng >= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS k10_groups,
       round(CAST(SUM(CASE WHEN ng = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS unique_group_share_6,
       round(CAST(SUM(CASE WHEN ng = 1 THEN ng ELSE 0 END) AS DOUBLE)
             / SUM(ng), 6) AS unique_record_share_6
FROM grps
"""
)


@register("uniqueness_risk_report", oracle=UNIQUENESS_SQL, covers=["J1", "A2"])
def q_uniqueness_risk_report(spark, sf_dir):
    """Sample-uniqueness risk: the k-level histogram of QI group
    sizes (k=1 / 2-4 / 5-9 / 10+) with the share of groups and of
    RECORDS that are sample-unique — the headline number of every
    re-identification assessment. Pure integer rollup of the group
    table.

    Ref semantics: SURVEY §2 J1/A2 (extension X-UNIQRISK)."""
    grps = _grps(_cells(spark, sf_dir))
    ng = F.col("ng")
    return grps.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((ng == 1).cast("int")).cast("long").alias("unique_groups"),
        F.sum(((ng >= 2) & (ng <= 4)).cast("int")).cast("long").alias(
            "k2_4_groups"
        ),
        F.sum(((ng >= 5) & (ng <= 9)).cast("int")).cast("long").alias(
            "k5_9_groups"
        ),
        F.sum((ng >= 10).cast("int")).cast("long").alias("k10_groups"),
        F.round(
            F.sum((ng == 1).cast("int")).cast("double") / F.count(F.lit(1)), 6
        ).alias("unique_group_share_6"),
        F.round(
            F.sum(F.when(ng == 1, ng).otherwise(0)).cast("double")
            / F.sum(ng),
            6,
        ).alias("unique_record_share_6"),
    )


# ---------------------------------------------------------------------------
# 4. Homogeneity-attack screen.

HOMOGENEITY_SQL = (
    "WITH "
    + _CELLS_SQL
    + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN max_c * 10 >= ng * 9 THEN 1 ELSE 0 END) AS BIGINT)
           AS homogeneous_groups,
       round(CAST(SUM(CASE WHEN max_c * 10 >= ng * 9 THEN ng ELSE 0 END)
                  AS DOUBLE) / SUM(ng), 6) AS exposed_record_share_6,
       round(CAST(SUM(CAST(max_c AS HUGEINT)) AS DOUBLE) / SUM(ng), 6)
           AS avg_top_value_share_6
FROM grps
"""
)


@register("homogeneity_attack_screen", oracle=HOMOGENEITY_SQL, covers=["J1", "A2", "P7"])
def q_homogeneity_attack_screen(spark, sf_dir):
    """Homogeneity-attack screen: QI groups where one sensitive value
    covers >= 90% of rows (the exact integer test max_c*10 >= ng*9 —
    no floating threshold), the share of records exposed by them, and
    the record-weighted average top-value share. Integer rollup of
    the group table.

    Ref semantics: SURVEY §2 J1/A2 (extension X-HOMOGENEITY)."""
    grps = _grps(_cells(spark, sf_dir))
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    homog = F.col("max_c") * 10 >= F.col("ng") * 9
    return grps.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(homog.cast("int")).cast("long").alias("homogeneous_groups"),
        F.round(
            F.sum(F.when(homog, F.col("ng")).otherwise(0)).cast("double")
            / F.sum("ng"),
            6,
        ).alias("exposed_record_share_6"),
        F.round(
            F.sum(dec(F.col("max_c"))).cast("double") / F.sum("ng"), 6
        ).alias("avg_top_value_share_6"),
    )
