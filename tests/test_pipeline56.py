"""Unit tests for batch-56: centroid confusion, silhouette, fertility."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_confusion_totals(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline56 import (
        q_nearest_centroid_confusion,
    )

    rows = q_nearest_centroid_confusion(spark, SF).collect()
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    # confusion matrix mass equals the corpus size
    assert sum(r.n for r in rows) == n_vec
    # diagonal beats chance overall: the synthetic labels are only
    # weakly separable, so assert above-random, not majority
    n_labels = len({r.true_label for r in rows})
    diag = sum(r.n for r in rows if r.pred_label == r.true_label)
    assert diag > n_vec / n_labels
    # every prediction is a real label id
    assert {r.pred_label for r in rows} <= {r.true_label for r in rows}


def test_label_centroids_exact_mean(spark):
    from prosnet_prefect_pipelines_spark.operators.similarity import label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 0.0])],
        "label int, embedding array<float>",
    )
    cents = {r.label: r.cv for r in label_centroids(df).collect()}
    assert cents[0] == [2.0, 4.0]
    assert cents[1] == [10.0, 0.0]


def test_silhouette_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline56 import q_silhouette_labels

    rows = q_silhouette_labels(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n for r in rows) == n_vec


def test_fertility_invariants(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline56 import q_tokenizer_fertility

    rows = q_tokenizer_fertility(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.tot_tokens > 0
        assert r.chars_per_token_ppm == r.tot_chars * 1_000_000 // r.tot_tokens
        assert r.tokens_per_doc_ppm == r.tot_tokens * 1_000_000 // r.n_docs
        # whitespace tokens always have at least 1 char each
        assert r.tot_chars >= r.tot_tokens
