"""Pipeline batch 64 (north-star extension): behavioral/statistical
analytics — per-user EWMA smoothing, exact integer 3-sigma outliers,
clickstream path mining, a Benford first-digit audit, and supplier
overlap pairs.

Exactness discipline: the EWMA recurrence runs entirely in non-negative
scaled integers ((3*s + v) div 4 — truncating division agrees across
engines for non-negative operands); the sigma test is the cross-
multiplied inequality (n*x - s)^2 > 9*(n*ss - s^2) — no square roots,
no floats; Benford expectations are hard-coded micro constants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# per-user EWMA of event values (alpha = 1/4), exact integer recurrence.

EWMA_SQL = """
WITH ev AS (
    SELECT user_id,
           CAST(round(value * 1000000) AS BIGINT) AS v,
           epoch_us(ts) AS ts_us, event_id
    FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
seq AS (
    SELECT user_id, list(v ORDER BY ts_us, event_id) AS vs
    FROM ev GROUP BY user_id
)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       CAST(list_reduce(vs, (s, v) -> (3 * s + v) // 4) AS BIGINT)
           AS ewma_micro
FROM seq
"""


@register("ewma_per_user", oracle=EWMA_SQL, covers=["A2", "T1"])
def q_ewma_per_user(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event values
    (alpha = 1/4), evaluated over the time-ordered event sequence as the
    exact integer recurrence s <- (3*s + v) div 4 seeded with the first
    value. Truncating integer division agrees across engines because
    every operand stays non-negative (values are micro-scaled >= 0).

    Scale shape: one shuffle to the user key, the ordered fold runs
    over each user's own (bounded) event list — the per-entity state
    recurrence every feature-store smoothing job needs, with no window
    re-sort per step and no float drift."""
    ev = read_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts_us").alias("t"),
                F.col("event_id").alias("e"),
                F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("rec")).alias("recs"))
        .select(
            "user_id",
            F.transform(F.col("recs"), lambda r: r.getField("v")).alias("vs"),
        )
    )
    n = F.size(F.col("vs"))
    # fold expressed via SQL expr to pin `div` (truncating integer
    # division — the DSL has no operator for it on the lambda variables)
    return seq.select(
        "user_id",
        n.cast("long").alias("n_events"),
        F.expr(
            "CAST(aggregate(slice(vs, 2, size(vs) - 1), vs[0], "
            "(s, v) -> (3L * s + v) div 4L) AS BIGINT)"
        ).alias("ewma_micro"),
    )


# ---------------------------------------------------------------------------
# exact integer 3-sigma outliers: cross-multiplied Chebyshev-style test,
# no sqrt, no floats.

SIGMA_SQL = """
WITH pts AS (
    SELECT l_partkey % 25 AS grp,
           CAST(round(l_quantity) AS BIGINT) AS x
    FROM lineitem
),
stats AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS ss
    FROM pts GROUP BY grp
)
SELECT p.grp AS grp, t.n,
       CAST(CAST(t.s AS HUGEINT) * 1000000 // t.n AS BIGINT) AS mean_micro,
       CAST(SUM(CASE WHEN CAST(t.n * p.x - t.s AS HUGEINT)
                          * CAST(t.n * p.x - t.s AS HUGEINT)
                        > 9 * CAST(t.n AS HUGEINT) * (t.n * t.ss - t.s * t.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM pts p JOIN stats t USING (grp)
GROUP BY p.grp, t.n, t.s
"""


@register("sigma_outliers_exact", oracle=SIGMA_SQL, covers=["A2", "J1"])
def q_sigma_outliers_exact(spark, sf_dir):
    """Per-group 3-sigma outlier counts with ZERO floating point: the
    test |x - mean| > 3*stddev is cross-multiplied into the pure-integer
    inequality (n*x - s)^2 > 9*n*(n*ss - s^2), so there is no sqrt, no
    division, and no engine-dependent rounding anywhere — the exact
    anomaly gate for pipelines that must be bit-reproducible.

    Scale shape: one partial-aggregated stats pass, stats joined back
    (group-keyed, broadcastable), one counting pass. Two scans of the
    fact column and nothing corpus-sized in memory."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.select(
        (F.col("l_partkey") % 25).alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
    )
    stats = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    joined = pts.join(F.broadcast(stats), "grp")
    dev = F.col("n") * F.col("x") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return joined.groupBy("grp", "n", "s").agg(
        F.sum(
            F.when(
                dev.cast("decimal(38,0)") * dev.cast("decimal(38,0)")
                > F.lit(9).cast("decimal(38,0)")
                * F.col("n").cast("decimal(38,0)")
                * var_n2.cast("decimal(38,0)"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        "grp",
        "n",
        F.expr("CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").alias(
            "mean_micro"
        ),
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# clickstream path mining: most common 3-step event-type paths.

PATHS_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
    FROM events WHERE user_id IS NOT NULL
),
seqs AS (
    SELECT user_id, list(event_type ORDER BY ts_us, event_id) AS et
    FROM ev GROUP BY user_id
),
tri AS (
    SELECT unnest(list_transform(generate_series(1, len(et) - 2),
                  i -> et[i] || '>' || et[i + 1] || '>' || et[i + 2])) AS path
    FROM seqs WHERE len(et) >= 3
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM tri GROUP BY path
ORDER BY n DESC, path LIMIT 10
"""


@register("path_trigrams_top", oracle=PATHS_SQL, covers=["A2", "O1"])
def q_path_trigrams_top(spark, sf_dir):
    """Clickstream path mining: the 10 most frequent consecutive
    3-step event-type paths across all users (ordered by event time,
    event-id tie-break) — the exploratory complement to the fixed-steps
    funnel_conversion query.

    Scale shape: one shuffle to the user key, per-user trigram
    construction over the (bounded) ordered sequence, a path-keyed
    count (the path vocabulary is |event_types|^3 — tiny), and a
    TakeOrdered top-10."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts_us").alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("et"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("rec")).alias("recs"))
        .select(
            F.transform(F.col("recs"), lambda r: r.getField("et")).alias("et")
        )
        .filter(F.size("et") >= 3)
    )
    tri = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("et") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(F.col("et"), i),
                    F.element_at(F.col("et"), i + 1),
                    F.element_at(F.col("et"), i + 2),
                ),
            )
        ).alias("path")
    )
    counts = tri.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("path")).limit(10)


# ---------------------------------------------------------------------------
# Benford first-digit audit over prices.

# round(log10(1 + 1/d) * 1e6) for d = 1..9 — fixed constants, no libm
# call at query time in either engine.
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {m}" for d, m in _BENFORD_MICRO.items()
)

BENFORD_SQL = f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS d
    FROM lineitem WHERE l_extendedprice >= 1.0
),
tot AS (SELECT COUNT(*) AS t FROM digits),
obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d)
SELECT o.d AS digit, CAST(o.n AS BIGINT) AS n,
       CAST(CAST(o.n AS HUGEINT) * 1000000 // t.t AS BIGINT) AS obs_ppm,
       CAST(CASE o.d {_BENFORD_CASE} END AS BIGINT) AS benford_ppm,
       CAST(abs(CAST(CAST(o.n AS HUGEINT) * 1000000 // t.t AS BIGINT)
                - (CASE o.d {_BENFORD_CASE} END)) AS BIGINT) AS dev_ppm
FROM obs o CROSS JOIN tot t
"""


@register("benford_digit_audit", oracle=BENFORD_SQL, covers=["A2", "P2"])
def q_benford_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit of prices — the classic
    fabricated-data / corruption screen. The first significant digit is
    extracted from the exact integer cent value (string of a BIGINT —
    identical formatting in every engine; prices >= 1 so the cent
    leading digit IS the price's leading digit); expected frequencies
    are hard-coded round(log10(1+1/d)*1e6) constants. One narrow pass +
    a 9-row aggregation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice") >= 1.0
    )
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    tot = digits.agg(F.count(F.lit(1)).alias("t"))
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_MICRO.items() for x in kv]
    )
    return obs.join(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)").alias(
            "obs_ppm"
        ),
        benford[F.col("d")].cast("long").alias("benford_ppm"),
        F.abs(
            F.expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)")
            - benford[F.col("d")]
        )
        .cast("long")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# supplier overlap pairs: bipartite co-membership with overlap coefficient.

OVERLAP_SQL = """
WITH bp AS (
    SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
deg AS (SELECT s, COUNT(*) AS c FROM bp GROUP BY s),
pairs AS (
    SELECT x.s AS a, y.s AS b, COUNT(*) AS n_shared
    FROM bp x JOIN bp y ON x.p = y.p AND x.s < y.s
    GROUP BY x.s, y.s
)
SELECT CAST(pr.a AS BIGINT) AS a, CAST(pr.b AS BIGINT) AS b,
       CAST(pr.n_shared AS BIGINT) AS n_shared,
       CAST(CAST(pr.n_shared AS HUGEINT) * 1000000
            // least(da.c, db.c) AS BIGINT) AS overlap_ppm
FROM pairs pr
JOIN deg da ON da.s = pr.a
JOIN deg db ON db.s = pr.b
WHERE pr.n_shared >= 3
"""


@register("supplier_overlap_pairs", oracle=OVERLAP_SQL, covers=["J1", "A2"])
def q_supplier_overlap_pairs(spark, sf_dir):
    """Supplier-supplier overlap coefficient (|A∩B| / min(|A|,|B|), in
    ppm) from the supplier-part bipartite graph — the one-mode
    projection every supply-chain redundancy analysis starts from.
    Candidate pairs are generated per part (quadratic in a part's
    supplier count — bounded by catalog fanout, never |suppliers|²);
    degrees are a broadcast dimension frame; min-shared 3 prunes noise."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    deg = bp.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        bp.alias("x")
        .join(bp.alias("y"), "p")
        .filter(F.col("x.s") < F.col("y.s"))
        .groupBy(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    da = deg.select(F.col("s").alias("a"), F.col("c").alias("ca"))
    db = deg.select(F.col("s").alias("b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.expr(
                "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000 "
                "div least(ca, cb) AS BIGINT)"
            ).alias("overlap_ppm"),
        )
    )
