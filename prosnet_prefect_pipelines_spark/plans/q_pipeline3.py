"""Training-data pipeline queries, batch 3 (north-star extension):
CDC changelog apply, Z-order layout statistics, portable HyperLogLog,
Bloom-pruned semi-joins, and weighted shortest paths.

Catalog conventions as ever: inputs derived deterministically in-query,
ratios/estimates in engine-exact arithmetic (integer `div`, dyadic
doubles), every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import audit as AU
from prosnet_prefect_pipelines_spark.operators import layout as LA
from prosnet_prefect_pipelines_spark.operators import sketch as SK
from prosnet_prefect_pipelines_spark.operators.graph import sssp_weighted
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# CDC changelog apply

CDC_APPLY_SQL = """
WITH base AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           o_orderstatus
    FROM orders
)
-- surviving original keys, with the latest change applied
SELECT o_orderkey,
       CASE WHEN o_orderkey % 12 = 0 THEN price_cents + 200
            WHEN o_orderkey % 6 = 0 THEN price_cents + 100
            ELSE price_cents END AS price_cents,
       o_orderstatus
FROM base
WHERE o_orderkey % 9 <> 0
UNION ALL
-- inserted keys (not present in the base snapshot)
SELECT o_orderkey + 10000000 AS o_orderkey,
       CAST(55500 AS BIGINT) AS price_cents,
       o_orderstatus
FROM base
WHERE o_orderkey % 15 = 0 AND (o_orderkey + 10000000) % 9 <> 0
"""


@register("cdc_apply", oracle=CDC_APPLY_SQL, covers=["T2", "J2"])
def q_cdc_apply(spark, sf_dir):
    """X-CDC-APPLY: Debezium-shaped changelog (U/D + seq) merged into a
    snapshot with last-write-wins per key — union + ONE keyed window
    pass. The oracle derives the expected end state directly from the
    synthetic edit pattern (an independent ground truth): %6 repriced
    (+100), %12 repriced again later (+200 wins by seq), %9 deleted
    last, %15 inserted under fresh keys."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        "o_orderstatus",
    )
    c1 = base.filter(k % 6 == 0).select(
        "o_orderkey",
        (F.col("price_cents") + 100).alias("price_cents"),
        "o_orderstatus",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    c2 = base.filter(k % 12 == 0).select(
        "o_orderkey",
        (F.col("price_cents") + 200).alias("price_cents"),
        "o_orderstatus",
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    c3 = base.filter(k % 9 == 0).select(
        "o_orderkey",
        "price_cents",
        "o_orderstatus",
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
    )
    c4 = base.filter(k % 15 == 0).select(
        (k + 10000000).alias("o_orderkey"),
        F.lit(55500).cast("long").alias("price_cents"),
        "o_orderstatus",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    changes = c1.unionByName(c2).unionByName(c3).unionByName(c4)
    return AU.cdc_apply(base, changes, ["o_orderkey"], order_cols=["seq"])


# ---------------------------------------------------------------------------
# Z-order layout statistics

_ZBITS = 10
_ZFILES = 64
_PER_FILE = (1 << (2 * _ZBITS)) // _ZFILES

_Z_TERMS_SQL = " | ".join(
    f"(((x >> {i}) & 1) << {2 * i}) | (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)

ZORDER_SQL = f"""
WITH pts AS (
    SELECT CAST(round(value * 10) AS BIGINT) % 1024 AS x,
           user_id % 1024 AS y
    FROM events
),
z AS (SELECT x, y, ({_Z_TERMS_SQL}) AS zv FROM pts)
SELECT zv // {_PER_FILE} AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z
GROUP BY zv // {_PER_FILE}
"""


@register("zorder_layout", oracle=ZORDER_SQL, covers=["O1", "A2"])
def q_zorder_layout(spark, sf_dir):
    """X-ZORDER: Morton-key file assignment + per-file min/max column
    stats — the data-skipping layout Delta/Iceberg bolt onto Spark,
    as a pure bit-interleave Column expression. Every simulated file
    covers a narrow range of BOTH dimensions (a 1-D sort would leave
    the second dimension spanning its full range in every file)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = events.select(
        (F.round(F.col("value") * 10).cast("long") % 1024).alias("x"),
        (F.col("user_id") % 1024).alias("y"),
    )
    return LA.zorder_layout_stats(pts, "x", "y", bits=_ZBITS, files=_ZFILES)


# ---------------------------------------------------------------------------
# portable HyperLogLog

_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / SK.HLL_M) * SK.HLL_M * SK.HLL_M)

HLL_SQL = f"""
WITH h AS (
    SELECT event_type,
           list_sum(list_transform(generate_series(1, 12), i ->
               CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
               * CAST(power(16, 12 - i) AS BIGINT))) AS hash48
    FROM events
),
parts AS (
    SELECT event_type,
           hash48 // {1 << SK._REM_BITS} AS b,
           hash48 % {1 << SK._REM_BITS} AS rem
    FROM h
),
regs AS (
    SELECT event_type, b,
           MAX({SK._REM_BITS + 1} - length(ltrim(bin(rem), '0'))) AS rank
    FROM parts GROUP BY event_type, b
),
agg AS (
    SELECT event_type,
           COUNT(*) AS nset,
           SUM(1.0 / (CAST(1 AS BIGINT) << rank)) AS s
    FROM regs GROUP BY event_type
)
SELECT event_type,
       -- FLOOR before the cast: DuckDB's double->BIGINT cast ROUNDS,
       -- Spark's truncates; floor makes both floor (values positive)
       CAST(FLOOR({_HLL_ALPHA_M2} / (s + ({SK.HLL_M} - nset))) AS BIGINT)
           AS hll_estimate,
       CAST(nset AS BIGINT) AS registers_set
FROM agg
"""


@register("hll_distinct", oracle=HLL_SQL, covers=["A1", "A2"])
def q_hll_distinct(spark, sf_dir):
    """X-HLL: per-event-type HLL distinct-user estimate whose REGISTER
    VALUES and estimate are bit-identical across engines (md5-derived
    hash, libm-free ranks, dyadic-rational harmonic sum) — the DuckDB
    twin recomputes the whole sketch and must agree exactly."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return SK.hll_distinct(events, ["event_type"], "user_id")


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join

BLOOM_SEMI_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l_partkey) AS BIGINT) AS key_sum
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 8)
"""


@register("bloom_semi_join", oracle=BLOOM_SEMI_SQL, covers=["J7", "S7"])
def q_bloom_semi_join(spark, sf_dir):
    """X-BLOOM: semi-join with a 2 KB Bloom bitset pruning the fact scan
    before the shuffle; the trailing exact semi-join removes false
    positives, so the oracle is the PLAIN semi-join — the sketch may
    only move work, never change answers."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    dim = part.filter(F.col("p_size") < 8).select("p_partkey")
    joined = SK.bloom_semi_join(lineitem, dim, "l_partkey", "p_partkey")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_partkey").cast("long").alias("key_sum"),
    )


# ---------------------------------------------------------------------------
# weighted shortest paths

SSSP_SQL = """
WITH RECURSIVE
e AS (
    -- dense two-moduli graph: diameter stays small at every sf, so the
    -- hop/dist recursion caps below are safely above any true shortest
    -- path (sparse variants have weighted-hop diameters near |V|, which
    -- both overruns the caps and grinds per-round fixpoints)
    SELECT CAST(o_orderkey % 101 AS VARCHAR) AS src,
           CAST(o_orderkey % 97 AS VARCHAR) AS dst,
           o_orderkey % 7 + 1 AS w
    FROM orders
),
walk(node, d, hops) AS (
    SELECT '0', CAST(0 AS BIGINT), 0
    UNION
    SELECT e.dst, walk.d + e.w, walk.hops + 1
    FROM walk JOIN e ON e.src = walk.node
    WHERE walk.hops < 30 AND walk.d + e.w <= 60
)
SELECT node, MIN(d) AS dist FROM walk GROUP BY node
"""


@register("sssp_weighted", oracle=SSSP_SQL, covers=["J5", "A2"])
def q_sssp_weighted(spark, sf_dir):
    """X-SSSP: delta-converging distributed Bellman-Ford from node '0'
    over an orders-derived weighted graph (two co-prime moduli for
    quasi-independent endpoints, weights 1..7). The oracle walks the
    same graph with a bounded recursive CTE (hop/dist caps far above
    the graph's true diameter) and min-aggregates."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    edges = orders.select(
        (k % 101).cast("string").alias("src"),
        (k % 97).cast("string").alias("dst"),
        (k % 7 + 1).alias("w"),
    )
    return sssp_weighted(edges, ["0"], max_iterations=50)
