"""Pipeline batch 57: seeded graph importance + training-run planning —

- ``ppr_seeded``: personalized PageRank over the nation trade graph
  with the teleport set restricted to one region's nations — "entity
  importance relative to a seed set", the graph-curation primitive for
  expanding a trusted core. Exact integer arithmetic, every iteration
  bit-identical to the unrolled DuckDB twin (same CTE machinery as the
  global PageRank oracle).
- ``token_budget_trim``: greedy per-language token-budget fill — order
  docs longest-first (deterministic tie-break), cumulative token sum,
  keep every doc that starts before the budget line. The "fill N
  tokens per language" selection step of a corpus mixture plan.
- ``epoch_shard_plan``: the data-loader manifest — deterministic
  hash-assignment of kept docs to shards (portable 48-bit md5
  fraction, so assignment survives engine swaps and reruns) with
  per-shard doc/token totals and id ranges.

Scale notes: PPR iterates on the aggregated nation graph (corpus-sized
work is the one-time edge mining); the budget trim's running sum is a
per-language window (per-key sort, not global — at 100 TB the per-key
partitions are the unit of parallelism); the shard plan is a narrow
hash + one keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import ranking as R
from prosnet_prefect_pipelines_spark.operators import sampling as SA
from prosnet_prefect_pipelines_spark.operators.textstats import tokens
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_curation import _frac_sql
from prosnet_prefect_pipelines_spark.plans.q_ranking import _pr_iter

PPR_ITERS = 8
SEED_REGION = "EUROPE"

PPR_SQL = (
    f"""
WITH edges AS (
    SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
seeds AS (
    SELECT n.n_nationkey AS node
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{SEED_REGION}'
),
ns AS (SELECT COUNT(*) AS k FROM seeds),
base AS (
    SELECT nd.node,
           CASE WHEN sd.node IS NOT NULL
                THEN CAST(15000000000000 // (100 * ns.k) AS BIGINT)
                ELSE 0 END AS base,
           CASE WHEN sd.node IS NOT NULL
                THEN CAST(1000000000000 // ns.k AS BIGINT)
                ELSE 0 END AS r0
    FROM nodes nd LEFT JOIN seeds sd ON nd.node = sd.node, ns
),
r0 AS (SELECT node, r0 AS r FROM base),
"""
    + ",".join(_pr_iter(i) for i in range(1, PPR_ITERS + 1))
    + f"""
SELECT n.n_name AS nation, r.node, r.r AS rank_scaled,
       round(r.r / 1000000000000.0, 6) AS rank
FROM r{PPR_ITERS} r JOIN nation n ON n.n_nationkey = r.node
WHERE r.r > 0
"""
)


@register("ppr_seeded", oracle=PPR_SQL, covers=["J5", "A2", "J1"])
def q_ppr_seeded(spark, sf_dir):
    """Personalized PageRank seeded on one region's nations — entity
    importance relative to a trusted core. The seed list is the
    broadcast-sized region dim (collected driver-side like the other
    threshold-gated dim fast paths); iterations run on the aggregated
    graph in exact integers."""
    from prosnet_prefect_pipelines_spark.model import load_tables

    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation", "region"]
    )
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
    )
    seeds = [
        r.n_nationkey
        for r in t["nation"]
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == SEED_REGION)
        .select("n_nationkey")
        .collect()
    ]
    pr = R.personalized_pagerank(edges, seeds, iterations=PPR_ITERS)
    return (
        pr.filter(F.col("rank_scaled") > 0)
        .join(F.broadcast(t["nation"]), pr["node"] == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "node", "rank_scaled", "rank")
    )


TOKEN_BUDGET = 2000

TRIM_SQL = f"""
WITH per_doc AS (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
ordered AS (
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM per_doc
)
SELECT doc_id, lang, n_tokens, cum_tokens,
       (cum_tokens - n_tokens) < {TOKEN_BUDGET} AS kept
FROM ordered
"""


@register("token_budget_trim", oracle=TRIM_SQL, covers=["A2", "O1", "P2"])
def q_token_budget_trim(spark, sf_dir):
    """Greedy per-language token-budget fill: longest-first order,
    running token sum, keep docs that start before the 2000-token
    budget line. The window is per-language (per-key sort — the unit
    of parallelism at scale), never a global sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = docs.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn("kept", (F.col("cum_tokens") - F.col("n_tokens")) < TOKEN_BUDGET)


N_SHARDS = 8

SHARD_SQL = f"""
WITH per_doc AS (
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
assigned AS (
    SELECT doc_id, n_tokens,
           CAST(floor(({_frac_sql('doc_id', '#shard')}) * {N_SHARDS}) AS BIGINT)
               AS shard
    FROM per_doc
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM assigned GROUP BY shard
"""


@register("epoch_shard_plan", oracle=SHARD_SQL, covers=["A2", "P2"])
def q_epoch_shard_plan(spark, sf_dir):
    """Data-loader manifest: portable-hash shard assignment (stable
    across engines/reruns/repartitioning) + per-shard doc and token
    totals. Narrow hash then one keyed aggregation with map-side
    combine."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = docs.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    frac = SA.portable_fraction(F.col("doc_id"), salt="#shard")
    assigned = per_doc.withColumn(
        "shard", F.floor(frac * N_SHARDS).cast("long")
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
