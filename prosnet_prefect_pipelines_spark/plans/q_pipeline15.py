"""Pipeline batch 15 (north-star extension): GNN training-data prep —
deterministic neighbor sampling (GraphSAGE fanout), deterministic
walks (node2vec-style corpus generation), link-prediction splits with
hash-mined negatives, and one-hop neighbor feature aggregation (the
message-passing layer as a join+agg) — each hash-matched against a
DuckDB twin.

All "randomness" is the portable 48-bit md5 hash, so samples, walks,
and negatives are pure functions of the graph — reproducible across
engines, reruns, and partitionings (the property GNN pipelines need for
cacheable epochs).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# shared interaction graph: 300 nodes from orders, no self loops
_EDGES_SQL = """
e AS (
    SELECT DISTINCT o_custkey % 300 AS src,
           (o_custkey + o_orderkey) % 300 AS dst
    FROM orders
    WHERE o_custkey % 300 <> (o_custkey + o_orderkey) % 300
)
"""


def _edges(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = (F.col("o_custkey") % 300).alias("src")
    dst = ((F.col("o_custkey") + F.col("o_orderkey")) % 300).alias("dst")
    return orders.select(src, dst).filter(F.col("src") != F.col("dst")).distinct()


def _hash48_sql(key_expr: str, salt: str = "") -> str:
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    return (
        "list_sum(list_transform(generate_series(1, 12), i -> "
        f"CAST(strpos('0123456789abcdef', substr({h}, i, 1)) - 1 AS BIGINT)"
        " * CAST(power(16, 12 - i) AS BIGINT)))"
    )


def _hash48(col, salt: str = ""):
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 12), 16, 10
    ).cast("long")


# --- GraphSAGE-style neighbor sampling ---------------------------------------------------

_NS_KEY = "CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)"

NEIGHBOR_SAMPLING_SQL = f"""
WITH {_EDGES_SQL.strip()},
ranked AS (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY {_hash48_sql(_NS_KEY, 'ns')}, dst) AS rn
    FROM e
)
SELECT src, dst, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 5
"""


@register("neighbor_sampling", oracle=NEIGHBOR_SAMPLING_SQL, covers=["O6", "O1"])
def q_neighbor_sampling(spark, sf_dir):
    """GraphSAGE fanout sampling: per node keep <= 5 neighbors, chosen
    by ranking on the portable hash of the edge — an unbiased,
    SEED-FREE sample that is identical every epoch and on every engine
    (cacheable minibatch neighborhoods). One window keyed on the node;
    at 100 TB this replaces the shuffle-heavy `sample()`-per-node loop
    GNN pipelines otherwise run."""
    e = _edges(spark, sf_dir)
    key = F.concat(
        F.col("src").cast("string"), F.lit(":"), F.col("dst").cast("string")
    )
    w = Window.partitionBy("src").orderBy(_hash48(key, "ns"), "dst")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("src", "dst", F.col("rn").cast("long").alias("rn"))
    )


# --- deterministic walks -----------------------------------------------------------------

def _step_sql(step: int, prev: str) -> str:
    key = f"CAST(w.seed AS VARCHAR) || '-{step}-' || CAST(e.dst AS VARCHAR)"
    return f"""
s{step} AS (
    SELECT seed, dst AS n{step} FROM (
        SELECT w.seed, e.dst,
               row_number() OVER (PARTITION BY w.seed
                                  ORDER BY {_hash48_sql(key, 'walk')}, e.dst) AS rn
        FROM {prev} w JOIN e ON e.src = w.cur
    ) t WHERE rn = 1
)"""


WALKS_SQL = f"""
WITH {_EDGES_SQL.strip()},
seeds AS (
    SELECT DISTINCT src AS seed, src AS cur FROM e WHERE src % 20 = 0
),
{_step_sql(1, 'seeds').strip()},
w1 AS (SELECT seed, n1 AS cur, n1 FROM s1),
{_step_sql(2, 'w1').strip()},
w2 AS (SELECT s2.seed, s2.n2 AS cur, w1.n1, s2.n2 FROM s2 JOIN w1 USING (seed)),
{_step_sql(3, 'w2').strip()}
SELECT w2.seed, w2.n1, w2.n2, s3.n3
FROM s3 JOIN w2 USING (seed)
"""


@register("deterministic_walks", oracle=WALKS_SQL, covers=["J1", "O6"])
def q_deterministic_walks(spark, sf_dir):
    """node2vec-style walk corpus, derandomized: from each seed, take 3
    steps, at each step choosing the out-neighbor with the minimum
    portable hash of (seed, step, neighbor) — walks are a pure function
    of the graph, so the walk corpus is reproducible and incremental
    (only walks touching changed nodes change). Each step is one keyed
    join + one per-seed window; k steps = k rounds, never a cross
    join."""
    e = _edges(spark, sf_dir)
    walks = (
        e.select(F.col("src").alias("seed"))
        .filter(F.col("seed") % 20 == 0)
        .distinct()
        .withColumn("cur", F.col("seed"))
    )
    for step in (1, 2, 3):
        key = F.concat(
            F.col("seed").cast("string"),
            F.lit(f"-{step}-"),
            F.col("dst").cast("string"),
        )
        w = Window.partitionBy("seed").orderBy(_hash48(key, "walk"), "dst")
        nxt = (
            walks.join(e, walks["cur"] == e["src"])
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "src", "cur")
            .withColumnRenamed("dst", f"n{step}")
            .withColumn("cur", F.col(f"n{step}"))
        )
        walks = nxt
    return walks.select("seed", "n1", "n2", "n3")


# --- link-prediction split ---------------------------------------------------------------

LINK_SPLIT_SQL = f"""
WITH {_EDGES_SQL.strip()},
pos AS (
    SELECT src, dst, 1 AS label,
           CASE WHEN {_hash48_sql(_NS_KEY, 'split')} % 5 = 0
                THEN 'test' ELSE 'train' END AS split
    FROM e
),
cand AS (
    SELECT src,
           CAST((CAST({_hash48_sql(_NS_KEY, 'neg')} AS BIGINT) + src) % 300 AS BIGINT)
               AS neg_dst,
           dst AS pos_dst
    FROM e
),
neg AS (
    SELECT DISTINCT c.src, c.neg_dst AS dst, 0 AS label,
           CASE WHEN {_hash48_sql("CAST(c.src AS VARCHAR) || ':' || CAST(c.neg_dst AS VARCHAR)", 'split')} % 5 = 0
                THEN 'test' ELSE 'train' END AS split
    FROM cand c
    LEFT JOIN e ON e.src = c.src AND e.dst = c.neg_dst
    WHERE e.src IS NULL AND c.src <> c.neg_dst
)
SELECT src, dst, CAST(label AS BIGINT) AS label, split FROM pos
UNION ALL
SELECT src, dst, CAST(label AS BIGINT) AS label, split FROM neg
"""


@register("link_prediction_split", oracle=LINK_SPLIT_SQL, covers=["J7", "P7"])
def q_link_prediction_split(spark, sf_dir):
    """Link-prediction dataset: positive edges hash-split 80/20
    train/test; negatives mined per positive edge by hashing to a
    candidate endpoint and ANTI-JOINING the real edge set (so negatives
    are guaranteed non-edges), deduped, split by the same hash rule.
    Hash-keyed membership means train/test never leak across reruns or
    engines. One anti-join + narrow maps — no candidate explosion."""
    e = _edges(spark, sf_dir)
    key = F.concat(F.col("src").cast("string"), F.lit(":"), F.col("dst").cast("string"))
    split = F.when(_hash48(key, "split") % 5 == 0, "test").otherwise("train")
    pos = e.select(
        "src", "dst", F.lit(1).cast("long").alias("label"), split.alias("split")
    )
    cand = e.select(
        "src", ((_hash48(key, "neg") + F.col("src")) % 300).alias("neg_dst")
    )
    neg_edges = (
        cand.filter(F.col("src") != F.col("neg_dst"))
        .join(
            e.withColumnRenamed("dst", "neg_dst"), on=["src", "neg_dst"], how="left_anti"
        )
        .distinct()
        .withColumnRenamed("neg_dst", "dst")
    )
    nkey = F.concat(F.col("src").cast("string"), F.lit(":"), F.col("dst").cast("string"))
    nsplit = F.when(_hash48(nkey, "split") % 5 == 0, "test").otherwise("train")
    neg = neg_edges.select(
        "src", "dst", F.lit(0).cast("long").alias("label"), nsplit.alias("split")
    )
    return pos.unionByName(neg)


# --- one-hop neighbor feature aggregation ------------------------------------------------

NEIGHBOR_AGG_SQL = f"""
WITH {_EDGES_SQL.strip()},
feats AS (
    SELECT c_custkey % 300 AS node,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS feat
    FROM customer GROUP BY c_custkey % 300
)
SELECT e.src AS node,
       CAST(COUNT(*) AS BIGINT) AS n_neighbors,
       CAST(SUM(f.feat) AS DOUBLE) AS feat_sum,
       round(CAST(SUM(f.feat) AS DOUBLE) / COUNT(*), 6) AS feat_mean
FROM e JOIN feats f ON f.node = e.dst
GROUP BY e.src
"""


@register("neighbor_feature_agg", oracle=NEIGHBOR_AGG_SQL, covers=["J1", "A2"])
def q_neighbor_feature_agg(spark, sf_dir):
    """One GNN message-passing layer as relational algebra: each node
    aggregates (count/sum/mean) its out-neighbors' features through the
    edge join — features carried as DECIMAL so partial-aggregation
    order cannot drift the sums. Shuffles on dst (feature fetch) then
    src (aggregation) — the exact shape of distributed GNN minibatch
    preparation."""
    e = _edges(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    feats = cust.groupBy((F.col("c_custkey") % 300).alias("node")).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("feat")
    )
    return (
        e.join(feats.withColumnRenamed("node", "dst"), on="dst")
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum("feat").cast("double").alias("feat_sum"),
            F.round(
                F.sum("feat").cast("double") / F.count(F.lit(1)), 6
            ).alias("feat_mean"),
        )
    )
