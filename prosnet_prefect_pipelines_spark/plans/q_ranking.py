"""Corpus-ranking queries (north-star extension): tf-idf, BM25, and
integer-scaled PageRank — the scoring/ranking tier of a training-data
pipeline, each hash-matched against a DuckDB twin.

Float discipline: idf/tf contributions are rounded to 6 dp before any
sum; BM25 totals are summed as scaled integers; PageRank is pure BIGINT
arithmetic — so every value is bit-identical across engines regardless
of partial-aggregation order (catalog convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import ranking as R
from prosnet_prefect_pipelines_spark.plans.catalog import register

TOKS_CTE = """
toks AS (
    SELECT doc_id AS id, t.term
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(term)
    WHERE t.term <> ''
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY id, term)
"""

TFIDF_SQL = f"""
WITH {TOKS_CTE},
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nn AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.id, tf.term, tf.tf, dfq.df,
           round(tf.tf * round(ln((nn.n_docs + 1) / (dfq.df + 1)) + 1, 6), 6)
               AS tfidf
    FROM tf JOIN dfq USING (term) CROSS JOIN nn
)
SELECT id, term, tf, df, tfidf FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term) AS rn
    FROM scored
) t WHERE rn <= 5
"""


@register("tfidf_terms", oracle=TFIDF_SQL, covers=["A1", "O6"])
def q_tfidf_terms(spark, sf_dir):
    """Top-5 tf-idf terms per document (smoothed sklearn idf). The
    document-frequency table is vocabulary-sized and broadcast into the
    scoring join; the per-doc top-k window partitions by doc id, so the
    sort is local to each doc's terms — no global sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = R.tfidf(docs, "doc_id", "text")
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("id", "term", "tf", "df", "tfidf")
    )


BM25_TERMS = ["spark", "query", "join"]

BM25_SQL = f"""
WITH {TOKS_CTE},
qtf AS (SELECT id, term, tf FROM tf WHERE term IN ('spark', 'query', 'join')),
dfq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
dl AS (
    SELECT doc_id AS id,
           len(string_split_regex(trim(text), '\\s+')) AS dl
    FROM documents
),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS sum_dl
    FROM documents
),
contrib AS (
    SELECT q.id,
           CAST(round(round(
               round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6)
               * ((q.tf * (1.2 + 1)) /
                  (q.tf + 1.2 * ((1 - 0.75) + 0.75 * (l.dl / (s.sum_dl / s.n_docs)))))
               , 6) * 1000000, 0) AS BIGINT) AS c6
    FROM qtf q
    JOIN dfq d USING (term)
    JOIN dl l ON l.id = q.id
    CROSS JOIN stats s
)
SELECT id, COUNT(*) AS n_hits,
       CAST(SUM(c6) AS BIGINT) / 1000000.0 AS score
FROM contrib GROUP BY id
"""


@register("bm25_rank", oracle=BM25_SQL, covers=["A2", "J1"])
def q_bm25_rank(spark, sf_dir):
    """Okapi BM25 (k1=1.2, b=0.75) of every document against a fixed
    query-term set. Per-term contributions are 6-dp-rounded and summed
    as scaled integers (order-independent); df and corpus stats are
    broadcast 1-row/vocab-row frames, so the only corpus-sized shuffles
    are the tf aggregation and the final per-doc sum."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return R.bm25(docs, "doc_id", "text", BM25_TERMS)


def _pr_iter(i: int) -> str:
    return f"""
c{i} AS (
    SELECT e.dst AS node, SUM(r.r // o.od) AS s
    FROM r{i - 1} r JOIN edges e ON r.node = e.src JOIN outd o ON o.src = e.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT b.node,
           CAST(b.base + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
    FROM base b LEFT JOIN c{i} c ON c.node = b.node
)"""


PAGERANK_ITERS = 10

PAGERANK_SQL = (
    """
WITH edges AS (
    SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
base AS (
    SELECT node,
           CAST(15000000000000 // (100 * nn.n) AS BIGINT) AS base,
           CAST(1000000000000 // nn.n AS BIGINT) AS r0
    FROM nodes, nn
),
r0 AS (SELECT node, r0 AS r FROM base),
"""
    + ",".join(_pr_iter(i) for i in range(1, PAGERANK_ITERS + 1))
    + f"""
SELECT n.n_name AS nation, r.node, r.r AS rank_scaled,
       round(r.r / 1000000000000.0, 6) AS rank
FROM r{PAGERANK_ITERS} r JOIN nation n ON n.n_nationkey = r.node
"""
)


@register("pagerank_nations", oracle=PAGERANK_SQL, covers=["J5", "A2"])
def q_pagerank_nations(spark, sf_dir):
    """PageRank over the nation-level trade graph (supplier nation ->
    customer nation edges mined from lineitem x orders x customer x
    supplier — the corpus-sized part of the plan; the iteration then
    runs on the aggregated graph). Ranks are scaled BIGINTs throughout
    (exact integer div/mul/add, damping 0.85 as 85/100), so all 10
    iterations are bit-identical to the DuckDB twin."""
    from prosnet_prefect_pipelines_spark.model import load_tables

    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"])
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
    )
    pr = R.pagerank(edges, iterations=PAGERANK_ITERS)
    return pr.join(
        F.broadcast(t["nation"]), pr["node"] == F.col("n_nationkey")
    ).select(F.col("n_name").alias("nation"), "node", "rank_scaled", "rank")
