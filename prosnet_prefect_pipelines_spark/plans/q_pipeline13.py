"""Pipeline batch 13 (north-star extension): prefix-filtered
set-similarity join (PPJoin candidate rule), golden-record attribute
fusion, nucleus-style per-domain quality cutoff, and market-basket
co-occurrence mining — each hash-matched against a DuckDB twin.

The prefix-filter oracle is deliberately the BRUTE-FORCE inverted-index
join: prefix filtering must produce byte-identical results while doing
asymptotically less candidate work.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import dedup as D
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_dedup import CORPUS_CTE, corpus

# --- prefix-filtered Jaccard join --------------------------------------------------------

JACCARD_PREFIX_SQL = f"""
WITH {CORPUS_CTE.strip()},
words AS (
    SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM corpus
),
toks AS (
    SELECT DISTINCT id, shingle AS tok FROM words,
    LATERAL (
        SELECT unnest(
            CASE WHEN len(w) >= 3
                 THEN list_transform(generate_series(1, len(w) - 2),
                                     i -> array_to_string(w[i:i+2], ' '))
                 ELSE [array_to_string(w, ' ')] END
        ) AS shingle
    ) s
    WHERE shingle <> ''
),
sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY id),
inter AS (
    SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM toks x JOIN toks y ON x.tok = y.tok AND x.id < y.id
    GROUP BY x.id, y.id
)
SELECT a, b,
       round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.a = sa.id
JOIN sizes sb ON inter.b = sb.id
WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.8
"""


@register("jaccard_prefix_filter", oracle=JACCARD_PREFIX_SQL, covers=["J1", "A2"])
def q_jaccard_prefix_filter(spark, sf_dir):
    """3-gram-shingle-set Jaccard >= 0.8 pairs via PPJoin-style prefix
    filtering: shingles globally ordered rarest-first, only each
    document's |d| - ceil(0.8|d|) + 1 rarest shingles are indexed, so
    hot shingles never enter the candidate join. The oracle is the FULL
    inverted index (the ngram_jaccard_pairs plan) — results must be
    identical while candidate work shrinks from sum(f_shingle^2) to the
    rare end of the shingle vocabulary."""
    return D.prefix_filter_jaccard_pairs(
        corpus(spark, sf_dir), "id", "text", 0.8, shingle_k=3
    )


# --- golden-record fusion ----------------------------------------------------------------

GOLDEN_RECORD_SQL = """
WITH recs AS (
    SELECT s_suppkey, s_suppkey % 100 AS cluster, s_name, s_nationkey, s_acctbal
    FROM supplier
),
name_pick AS (
    SELECT cluster, s_name,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY length(s_name) DESC, s_name) AS rn
    FROM recs
),
nation_counts AS (
    SELECT cluster, s_nationkey, CAST(COUNT(*) AS BIGINT) AS c FROM recs
    GROUP BY cluster, s_nationkey
),
nation_pick AS (
    SELECT cluster, s_nationkey,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY c DESC, s_nationkey) AS rn
    FROM nation_counts
),
base AS (
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal,
           MIN(s_suppkey) AS canonical_id
    FROM recs GROUP BY cluster
)
SELECT base.cluster, canonical_id, n_members,
       np.s_name AS name, nt.s_nationkey AS nationkey, acctbal
FROM base
JOIN (SELECT cluster, s_name FROM name_pick WHERE rn = 1) np USING (cluster)
JOIN (SELECT cluster, s_nationkey FROM nation_pick WHERE rn = 1) nt USING (cluster)
"""


@register("golden_record", oracle=GOLDEN_RECORD_SQL, covers=["J9", "O6", "A2"])
def q_golden_record(spark, sf_dir):
    """Golden-record fusion (master-data-management survivorship): per
    duplicate cluster, fuse attributes by explicit deterministic rules —
    longest name (tie: lexicographic), most-frequent nation (tie: min),
    max balance, min id as the canonical key. Each rule is a window or
    aggregate keyed on the cluster — one shuffle family, no collect."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    recs = sup.select(
        "s_suppkey",
        (F.col("s_suppkey") % 100).alias("cluster"),
        "s_name",
        "s_nationkey",
        "s_acctbal",
    )
    wn = Window.partitionBy("cluster").orderBy(
        F.length("s_name").desc(), F.col("s_name")
    )
    name_pick = (
        recs.withColumn("_rn", F.row_number().over(wn))
        .filter(F.col("_rn") == 1)
        .select("cluster", F.col("s_name").alias("name"))
    )
    ncounts = recs.groupBy("cluster", "s_nationkey").agg(F.count(F.lit(1)).alias("c"))
    wnat = Window.partitionBy("cluster").orderBy(F.col("c").desc(), F.col("s_nationkey"))
    nation_pick = (
        ncounts.withColumn("_rn", F.row_number().over(wnat))
        .filter(F.col("_rn") == 1)
        .select("cluster", F.col("s_nationkey").alias("nationkey"))
    )
    base = recs.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.col("s_acctbal").cast("decimal(18,6)")).cast("double").alias("acctbal"),
        F.min("s_suppkey").alias("canonical_id"),
    )
    return base.join(name_pick, on="cluster").join(nation_pick, on="cluster").select(
        "cluster", "canonical_id", "n_members", "name", "nationkey", "acctbal"
    )


# --- nucleus-style per-domain quality cutoff ---------------------------------------------

DOMAIN_TOP_SQL = """
WITH ranked AS (
    SELECT source, doc_id, n_chars,
           SUM(n_chars) OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(n_chars) OVER (PARTITION BY source) AS total
    FROM documents
)
SELECT source, doc_id, n_chars
FROM ranked
WHERE 5 * (cum - n_chars) < 4 * total
"""


@register("domain_top_quality", oracle=DOMAIN_TOP_SQL, covers=["O1", "A2"])
def q_domain_top_quality(spark, sf_dir):
    """Nucleus-style curation cutoff: per domain, keep the best
    documents until the kept mass reaches 80% of the domain's total
    (keep while the cumulative mass BEFORE the doc is under the
    cutoff — so every domain keeps at least its best doc). The integer
    cross-multiplied comparison (5*cum_prev < 4*total) avoids float
    boundaries entirely. Two windows keyed on the domain — no global
    sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wcum = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(wtot).alias("total"),
    )
    return ranked.filter(
        5 * (F.col("cum") - F.col("n_chars")) < 4 * F.col("total")
    ).select("source", "doc_id", "n_chars")


# --- market-basket co-occurrence ---------------------------------------------------------

BASKET_SQL = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey % 50 AS item FROM lineitem
),
pairs AS (
    SELECT x.item AS i1, y.item AS i2, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items x JOIN items y ON x.l_orderkey = y.l_orderkey AND x.item < y.item
    GROUP BY x.item, y.item
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY n_orders DESC, i1, i2) AS rn FROM pairs
)
SELECT i1, i2, n_orders FROM ranked WHERE rn <= 20
"""


@register("basket_pairs", oracle=BASKET_SQL, covers=["J1", "A2", "O1"])
def q_basket_pairs(spark, sf_dir):
    """Market-basket pair mining: top-20 item-group pairs by distinct
    co-occurring orders. The self-join keys on the basket id, so pair
    generation is per-basket quadratic (baskets are small) and never
    |items|^2; the co-occurrence count shuffles on the pair. The same
    plan shape feeds association rules and item-item recommenders."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    ).distinct()
    pairs = (
        items.alias("x")
        .join(items.alias("y"), on="l_orderkey")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("i1"), F.col("y.item").alias("i2"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # orderBy+limit = TakeOrdered (per-partition k-row heaps merged on
    # the driver) — a global row_number window would SinglePartition the
    # whole pair frame
    return pairs.orderBy(F.col("n_orders").desc(), "i1", "i2").limit(20).select(
        "i1", "i2", "n_orders"
    )
