"""Pipeline batch 59: corpus novelty + mutual nearest neighbors —

- ``ngram_novelty``: per-document novelty curve — the fraction of a
  doc's distinct word-3-grams whose FIRST corpus occurrence (min
  doc_id) is this doc. Low novelty late in the ordering = near-copy /
  boilerplate mass; the memorization-risk signal a curation run
  tracks. Exact integer ppm.
- ``mutual_nn_pairs``: reciprocal best-match pairs — vectors that are
  each other's cosine top-1 — the bitext/translation-pair mining
  primitive. Exact tier here (same quadratic baseline as
  ann_cosine_topk, verification scale only); at cluster scale the
  same mutual filter composes over ann_topk's LSH/IVF candidates
  (operators/similarity.py router) instead of the brute-force table.

Scale notes: novelty is one shingle explode + two keyed aggregations
plus one hash join on shingle (all map-side combinable, no
corpus-squared term); the mutual filter itself is top-1-table sized
(one row per vector) joined on itself — linear.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import similarity as S
from prosnet_prefect_pipelines_spark.operators.dedup import word_shingles
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_similarity import COSINE_TOPK_SQL

NOVELTY_SQL = """
WITH words AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
shingles AS (
    SELECT DISTINCT doc_id, shingle FROM words,
    LATERAL (
        SELECT unnest(
            CASE WHEN len(w) >= 3
                 THEN list_transform(generate_series(1, len(w) - 2),
                                     i -> array_to_string(w[i:i+2], ' '))
                 ELSE [array_to_string(w, ' ')] END
        ) AS shingle
    ) s
),
firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM shingles GROUP BY shingle)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // CAST(COUNT(*) AS BIGINT) AS novelty_ppm
FROM shingles s JOIN firsts f ON f.shingle = s.shingle
GROUP BY s.doc_id
"""


@register("ngram_novelty", oracle=NOVELTY_SQL, covers=["A2", "J1", "O3"])
def q_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty (first-occurrence attribution by min
    doc_id) in exact integer ppm. Shingle explode -> min-agg ->
    hash join back on shingle; every stage map-side combinable."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
    )
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
    ).distinct()
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm", F.expr("(n_novel * 1000000) div n_shingles")
        )
    )


MUTUAL_SQL = f"""
WITH t5 AS (SELECT * FROM ({COSINE_TOPK_SQL}) t),
top1 AS (
    SELECT id, neighbor, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY id
                                     ORDER BY cos DESC, neighbor) AS rn
        FROM t5
    ) r WHERE rn = 1
)
SELECT a.id AS id_a, a.neighbor AS id_b, a.cos
FROM top1 a JOIN top1 b ON a.neighbor = b.id AND b.neighbor = a.id
WHERE a.id < a.neighbor
"""


@register("mutual_nn_pairs", oracle=MUTUAL_SQL, covers=["O6", "J1"])
def q_mutual_nn_pairs(spark, sf_dir):
    """Reciprocal best matches: pairs that are each other's cosine
    top-1. The top-1 table is linear (one row per vector); the mutual
    check is a self-join of that table. Brute-force scoring tier is
    the exact baseline (verification scale), like ann_cosine_topk."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top1 = S.cosine_topk(emb, "vec_id", "embedding", k=1, dim=64)
    a = top1.select(
        F.col("id").alias("id_a"), F.col("neighbor").alias("id_b"), "cos"
    )
    b = top1.select(
        F.col("id").alias("b_id"), F.col("neighbor").alias("b_nbr")
    )
    return (
        a.join(b, (F.col("id_b") == F.col("b_id")) & (F.col("b_nbr") == F.col("id_a")))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cos")
    )
