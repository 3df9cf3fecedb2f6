"""Unit tests for batch-55: RRF fusion, nDCG/MRR eval, char entropy."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_scores(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline55 import q_rrf_fusion

    rows = q_rrf_fusion(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        # every fused item was retrieved by at least one side
        assert r.lex_rank is not None or r.dense_rank is not None
        expect = 0
        if r.lex_rank is not None:
            expect += round(1_000_000.0 / (60 + r.lex_rank))
        if r.dense_rank is not None:
            expect += round(1_000_000.0 / (60 + r.dense_rank))
        assert abs(r.rrf_score - expect / 1_000_000.0) < 1e-9
    # dual-retrieved items outrank single-retriever items of equal rank
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_operator_missing_side(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "id long, rank long")
    out = {r.id: r for r in rrf_fuse([("a", a), ("b", b)], k=60).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].b_rank is None and out[3].a_rank is None
    # item 2 retrieved by both: contribution sum 1/(62) + 1/(61)
    assert abs(
        out[2].rrf_score
        - (round(1e6 / 62) + round(1e6 / 61)) / 1e6
    ) < 1e-9


def test_ndcg_eval_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline55 import q_ndcg_eval

    rows = q_ndcg_eval(spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert 0.0 <= r.mrr <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9
        # labels 0..3 all exist in the corpus
        assert r.n_rel > 0


def test_ndcg_mrr_known_values(spark):
    from prosnet_prefect_pipelines_spark.operators.ranking import ndcg_mrr

    # one query, 3 ranked items: rel 0, 3, 1 at ranks 1, 2, 3
    df = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 3), (0, 3, 1)], "q int, rank long, rel int"
    )
    r = ndcg_mrr(df, k=10).collect()[0]
    dcg = round(7 / math.log2(3), 6) + round(1 / math.log2(4), 6)
    idcg = round(7 / math.log2(2), 6) + round(1 / math.log2(3), 6)
    assert abs(r.dcg - round(dcg, 6)) < 2e-6
    assert abs(r.idcg - round(idcg, 6)) < 2e-6
    assert abs(r.mrr - 0.5) < 1e-9
    assert r.n_rel == 2


def test_mrr_truncated_first_hit_beyond_k(spark):
    """Truncated MRR@k: when the FIRST relevant item ranks past the k
    cutoff, the query contributes mrr = 0 (not 1/rank) — the branch the
    known-values test (first hit at rank 2 < k) never exercises."""
    from prosnet_prefect_pipelines_spark.operators.ranking import ndcg_mrr

    # first (and only) relevant item at rank 4, evaluated at k=3
    df = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 0), (0, 3, 0), (0, 4, 2)],
        "q int, rank long, rel int",
    )
    r = ndcg_mrr(df, k=3).collect()[0]
    assert r.mrr == 0.0
    # same ranking at k=4 picks the hit up again
    r4 = ndcg_mrr(df, k=4).collect()[0]
    assert abs(r4.mrr - 0.25) < 1e-9


def test_char_entropy_extremes(spark):
    from prosnet_prefect_pipelines_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "abcdefghijklmnop"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in char_entropy(df, prefix_len=120).collect()}
    # null/empty rows filtered
    assert set(out) == {1, 2}
    # single repeated char: zero entropy (and not -0.0), flagged low
    assert out[1].entropy == 0.0 and out[1].low_entropy
    # 16 distinct chars: ln(16) nats (above the 2.5-nat gate)
    assert abs(out[2].entropy - math.log(16)) < 1e-5
    assert not out[2].low_entropy


def test_char_entropy_prefix_bound(spark):
    from prosnet_prefect_pipelines_spark.operators.textstats import char_entropy

    df = spark.createDataFrame([(1, "ab" * 400)], "doc_id long, text string")
    r = char_entropy(df, prefix_len=120).collect()[0]
    assert r.n_used == 120  # bounded explode, not the full 800 chars
    assert abs(r.entropy - math.log(2)) < 1e-5
