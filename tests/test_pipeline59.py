"""Unit tests for batch-59: n-gram novelty, mutual nearest neighbors."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ngram_novelty_bounds_and_attribution(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline59 import q_ngram_novelty

    rows = q_ngram_novelty(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .count()
    )
    assert len(rows) == docs
    by_id = sorted(rows, key=lambda r: r.doc_id)
    # the first doc in id order introduces every one of its shingles
    assert by_id[0].novelty_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_ppm == r.n_novel * 1_000_000 // r.n_shingles


def test_ngram_novelty_exact_copy_scores_zero(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline59 import q_ngram_novelty

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
             (3, "zeta eta theta iota")],
            "doc_id long, text string",
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q_ngram_novelty(spark, d).collect()}
    assert out[1].novelty_ppm == 1_000_000
    assert out[2].novelty_ppm == 0  # exact copy introduces nothing
    assert out[3].novelty_ppm == 1_000_000


def test_mutual_nn_pairs_symmetry(spark):
    from prosnet_prefect_pipelines_spark.operators.similarity import cosine_topk
    from prosnet_prefect_pipelines_spark.plans.q_pipeline59 import q_mutual_nn_pairs
    from pyspark.sql import functions as F

    pairs = q_mutual_nn_pairs(spark, SF).collect()
    assert pairs  # the synthetic corpus contains near-duplicate vectors
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    top1 = {
        r.id: r.neighbor
        for r in cosine_topk(emb, "vec_id", "embedding", k=1).collect()
    }
    for p in pairs:
        assert p.id_a < p.id_b
        # reciprocity: each is the other's top-1
        assert top1[p.id_a] == p.id_b and top1[p.id_b] == p.id_a
