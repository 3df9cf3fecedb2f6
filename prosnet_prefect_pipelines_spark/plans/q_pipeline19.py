"""Pipeline batch 19 (north-star extension): Gini concentration,
Benford first-digit audit, Markov transition matrix, and HLL set
intersection — analytics/audit depth, each hash-matched against a
DuckDB twin.

Determinism: Gini and rates are integer ppm via `div`; Benford digits
come from integer cents (never from double formatting); the HLL
intersection composes the portable md5 register construction already
proven by hll_distinct.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import sketch as SK
from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- Gini concentration ------------------------------------------------------------------

GINI_SQL = """
WITH ranked AS (
    SELECT source, CAST(n_chars AS BIGINT) AS x,
           row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS total,
       CAST((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x)) * 1000000
            // (COUNT(*) * SUM(x)) AS BIGINT) AS gini_ppm
FROM ranked GROUP BY source
"""


@register("gini_concentration", oracle=GINI_SQL, covers=["A2", "O1"])
def q_gini_concentration(spark, sf_dir):
    """Per-domain Gini coefficient of document mass (is the corpus
    dominated by a few giant documents?) via the exact rank identity
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over the per-group
    sort — kept in integer ppm, and tie-order-invariant (equal x
    contribute x*(i1+i2) under any tie permutation). One keyed window
    + one aggregation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("total"),
        F.expr(
            "CAST((2 * sum(i * x) - (count(1) + 1) * sum(x)) * 1000000"
            " div (count(1) * sum(x)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# --- Benford first-digit audit -----------------------------------------------------------

_BENFORD_PPM = {d: int(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
)

BENFORD_SQL = f"""
WITH cents AS (
    SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders
    WHERE o_totalprice > 0
),
digits AS (
    SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM cents
),
counts AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT digit, n,
       CAST(n * 1000000 // total AS BIGINT) AS observed_ppm,
       CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS expected_ppm
FROM counts CROSS JOIN tot
"""


@register("benford_audit", oracle=BENFORD_SQL, covers=["A2"])
def q_benford_audit(spark, sf_dir):
    """Benford first-digit audit of order totals (fabricated or
    truncated monetary data diverges from log10(1+1/d)): digits come
    from INTEGER cents, never from double formatting (engines format
    doubles differently); observed and expected shares are integer
    ppm. One aggregation + a broadcast scalar total."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = orders.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v")
    )
    digits = cents.select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[x for d, ppm in _BENFORD_PPM.items() for x in (F.lit(d), F.lit(ppm))]
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 div total").alias("observed_ppm"),
            expected[F.col("digit")].cast("long").alias("expected_ppm"),
        )
    )


# --- Markov transition matrix ------------------------------------------------------------

TRANSITION_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
    FROM events
),
trans AS (
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
),
outs AS (
    SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_total FROM trans GROUP BY from_type
)
SELECT from_type, to_type, n,
       CAST(n * 1000000 // out_total AS BIGINT) AS rate_ppm
FROM trans JOIN outs USING (from_type)
"""


@register("transition_matrix", oracle=TRANSITION_SQL, covers=["A2", "O1"])
def q_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (the product-analytics handoff report): one keyed lead()
    window builds bigrams, counts shuffle on the (from, to) pair,
    row-normalization joins the tiny out-degree table back — rates in
    integer ppm."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    outs = trans.groupBy("from_type").agg(F.sum("n").alias("out_total"))
    return (
        trans.join(F.broadcast(outs), on="from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000000 div out_total").alias("rate_ppm"),
        )
    )


# --- HLL set intersection ----------------------------------------------------------------

_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / SK.HLL_M) * SK.HLL_M * SK.HLL_M)

_HLL_SIDE_SQL = f"""
h AS (
    SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS side,
           list_sum(list_transform(generate_series(1, 12), i ->
               CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
               * CAST(power(16, 12 - i) AS BIGINT))) AS hash48
    FROM events WHERE event_type IN ('click', 'view')
),
parts AS (
    SELECT side, hash48 // {1 << SK._REM_BITS} AS b,
           hash48 % {1 << SK._REM_BITS} AS rem
    FROM h
),
regs AS (
    SELECT side, b,
           MAX({SK._REM_BITS + 1} - length(ltrim(bin(rem), '0'))) AS rank
    FROM parts GROUP BY side, b
),
uregs AS (
    SELECT 'u' AS side, b, MAX(rank) AS rank FROM regs GROUP BY b
),
allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM uregs),
agg AS (
    SELECT side, COUNT(*) AS nset,
           SUM(1.0 / (CAST(1 AS BIGINT) << rank)) AS s
    FROM allregs GROUP BY side
),
ests AS (
    SELECT side,
           CAST(FLOOR({_ALPHA_M2} / (s + ({SK.HLL_M} - nset))) AS BIGINT) AS est
    FROM agg
)
"""

HLL_INTERSECT_SQL = f"""
WITH {_HLL_SIDE_SQL.strip()}
SELECT CAST(SUM(CASE WHEN side = 'a' THEN est END) AS BIGINT) AS est_a,
       CAST(SUM(CASE WHEN side = 'b' THEN est END) AS BIGINT) AS est_b,
       CAST(SUM(CASE WHEN side = 'u' THEN est END) AS BIGINT) AS est_union,
       CAST(SUM(CASE WHEN side = 'u' THEN -est ELSE est END) AS BIGINT)
           AS est_intersection
FROM ests
"""


@register("hll_intersection", oracle=HLL_INTERSECT_SQL, covers=["A1", "A2"])
def q_hll_intersection(spark, sf_dir):
    """Audience-overlap estimation from sketches alone: |A∩B| ≈
    |A| + |B| - |A∪B| where the union sketch is the bucketwise MAX of
    the two register tables (the HLL lattice merge) — set intersection
    without ever shuffling the raw membership lists. Reuses the
    portable md5 register construction proven by hll_distinct."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sides = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias("side"),
        "user_id",
    )
    regs = SK.hll_registers(sides, ["side"], "user_id")
    uregs = regs.groupBy("_b").agg(F.max("_rank").alias("_rank")).select(
        F.lit("u").alias("side"), "_b", "_rank"
    )
    allregs = regs.select("side", "_b", "_rank").unionByName(uregs)
    ests = SK.hll_estimate(allregs, ["side"]).select("side", F.col("hll_estimate").alias("est"))
    return ests.agg(
        F.sum(F.when(F.col("side") == "a", F.col("est"))).cast("long").alias("est_a"),
        F.sum(F.when(F.col("side") == "b", F.col("est"))).cast("long").alias("est_b"),
        F.sum(F.when(F.col("side") == "u", F.col("est"))).cast("long").alias("est_union"),
        F.sum(
            F.when(F.col("side") == "u", -F.col("est")).otherwise(F.col("est"))
        ).cast("long").alias("est_intersection"),
    )
