"""Edge cases for the curation-family operators (decontamination,
repetition, quantization, salted aggregation) that the sf-scale oracles
don't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import dedup as D
from prosnet_prefect_pipelines_spark.operators import similarity as S
from prosnet_prefect_pipelines_spark.operators.aggregates import salted_aggregate


def test_contamination_finds_verbatim_leak_and_respects_min_common(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words here entirely now"),
        ],
        "id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over something")], "id long, text string"
    )
    hits = D.ngram_contamination(train, "id", "text", ev, "id", "text", k=3).collect()
    assert [(r.train_id, r.eval_id) for r in hits] == [(1, 100)]
    # 'the quick brown', 'quick brown fox', 'brown fox jumps', 'fox jumps over'
    assert hits[0].n_common == 4
    none = D.ngram_contamination(
        train, "id", "text", ev, "id", "text", k=3, min_common=5
    ).collect()
    assert none == []


def test_repetition_stats_doubled_doc_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "one two")], "id long, text string"
    )
    rows = {r.id: r for r in D.repetition_stats(df, "id", "text", k=3).collect()}
    # doc 1: 4 3-grams [abc, bca, cab, abc] -> 1 repeat of 4
    assert rows[1].n_ngrams == 4 and rows[1].n_distinct == 3
    assert abs(rows[1].dup_ngram_frac - 0.25) < 1e-9
    # short doc: one whole-text shingle, no repetition
    assert rows[2].n_ngrams == 1 and rows[2].dup_ngram_frac == 0.0


def test_quantize_int8_zero_vector_and_range(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "id long, v array<double>",
    )
    rows = {r.id: r for r in S.quantize_int8(df, "id", "v").collect()}
    assert rows[1].scale == 0.0 and rows[1].q == [0, 0, 0]
    assert rows[2].q == [64, -127, 32]  # scale = 2/127; 1.0/(2/127) = 63.5 -> 64
    assert all(-127 <= x <= 127 for r in rows.values() for x in r.q)


def test_salted_aggregate_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(1000)], "k int, id long, x double"
    )
    plain = {
        (r.k): (r.n, r.sx)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("x").cast("decimal(18,2)")).alias("sx"))
        .collect()
    }
    for buckets in (1, 16):
        salted = {
            (r.k): (r.n, r.sx)
            for r in salted_aggregate(
                df, ["k"],
                {"n": ("count", F.lit(1)), "sx": ("sum", F.col("x").cast("decimal(18,2)"))},
                salt_buckets=buckets, salt_on="id",
            ).collect()
        }
        assert salted == plain


def test_ann_topk_routes_and_guards_quadratic(spark):
    import pytest

    from prosnet_prefect_pipelines_spark.operators.similarity import ann_topk

    df = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 3) % 7), 1.0]) for i in range(40)],
        "id long, v array<double>",
    )
    with pytest.raises(ValueError, match="allow_quadratic"):
        ann_topk(df, "id", "v", dim=3, method="exact")
    exact = ann_topk(
        df, "id", "v", dim=3, k=100, method="exact", allow_quadratic=True
    )
    auto = ann_topk(df, "id", "v", dim=3, k=3, method="auto", planes=4).collect()
    assert auto  # buckets produced candidates
    # recall may be < 1, but precision is exact: every returned pair's
    # cosine equals the brute-force value for that pair
    all_cos = {(r.id, r.neighbor): r.cos for r in exact.collect()}
    assert all(all_cos[(r.id, r.neighbor)] == r.cos for r in auto)
