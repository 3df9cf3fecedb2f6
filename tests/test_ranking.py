"""Unit tests for the corpus-ranking tier (tf-idf, BM25, PageRank) and
the round-2 text/dedup additions (PII scrub, n-grams, SemDeDup)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import ranking as R
from prosnet_prefect_pipelines_spark.operators import textstats as T


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join spark"),
            (2, "join query plan"),
            (3, "plan plan plan"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_values(spark):
    rows = {
        (r.id, r.term): r
        for r in R.tfidf(_docs(spark), "doc_id", "text").collect()
    }
    # 'spark' appears in 1 of 3 docs, twice in doc 1
    r = rows[(1, "spark")]
    assert r.tf == 2 and r.df == 1
    assert r.tfidf == round(2 * round(math.log((3 + 1) / (1 + 1)) + 1, 6), 6)
    # 'plan' in 2 docs
    assert rows[(3, "plan")].df == 2


def test_bm25_monotone_in_tf(spark):
    scores = {
        r.id: r.score
        for r in R.bm25(_docs(spark), "doc_id", "text", ["spark", "join"]).collect()
    }
    # doc 1 has spark(x2)+join, doc 2 only join; doc 3 no hit -> absent
    assert scores[1] > scores[2]
    assert 3 not in scores
    # exact multiple of 1e-6 (scaled-integer summation)
    assert abs(scores[1] * 1e6 - round(scores[1] * 1e6)) < 1e-6


def test_pagerank_cycle_uniform(spark):
    # 3-cycle: symmetric, every node must hold the same rank, and the
    # rank must stay near 1/3 (mass conserved up to integer truncation)
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = {r.node: r.rank_scaled for r in R.pagerank(e, iterations=5).collect()}
    assert len(set(got.values())) == 1
    assert abs(next(iter(got.values())) - R.PR_SCALE // 3) < 1000


def test_pagerank_sink_attracts_mass(spark):
    # star into node 9: 9 gets strictly more rank than its sources
    e = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], "src long, dst long")
    got = {r.node: r.rank_scaled for r in R.pagerank(e, iterations=3).collect()}
    assert got[9] > got[1] == got[2] == got[3]


def test_pagerank_driver_and_distributed_paths_agree(spark):
    """The adaptive strategy must be invisible: the driver integer loop
    (default for small graphs) and the distributed join/agg loop
    (forced via driver_threshold=0) produce identical scaled ranks on a
    graph with asymmetric degrees, dangling nodes, and a cycle."""
    import random

    rng = random.Random(115)
    edges = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(80)})
    e = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        r.node: (r.rank_scaled, r.rank)
        for r in R.pagerank(e, iterations=6).collect()
    }
    slow = {
        r.node: (r.rank_scaled, r.rank)
        for r in R.pagerank(e, iterations=6, driver_threshold=0).collect()
    }
    assert fast == slow


def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b@x.org or 555-123-4567 at 10.0.0.1 ok")],
        "id long, text string",
    )
    c = T.pii_counts(F.col("text"))
    out = df.select(
        c["n_emails"].alias("e"),
        c["n_phones"].alias("p"),
        c["n_ips"].alias("i"),
        T.redact_pii(F.col("text")).alias("clean"),
    ).first()
    assert (out.e, out.p, out.i) == (1, 1, 1)
    assert out.clean == "mail <EMAIL> or <PHONE> at <IP> ok"


def test_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "a b c")], "id long, text string")
    got = {r.id: r.ng for r in df.select("id", T.ngrams(F.col("text"), 2).alias("ng")).collect()}
    assert got[1] == []
    assert got[2] == ["a b", "b c"]


def test_semdedup_drops_larger_id_duplicate(spark):
    from prosnet_prefect_pipelines_spark.operators.dedup import semdedup

    # vec 1 and 3 identical; 2 orthogonal. n_cells=1 -> one cluster.
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.id: r.kept for r in semdedup(df, "vec_id", "embedding", n_cells=1, threshold=0.9).collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_approx_quantiles_near_exact(spark, sf_dir):
    from prosnet_prefect_pipelines_spark.operators.aggregates import (
        approx_quantiles,
        exact_quantiles,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probs = [0.25, 0.5, 0.75]
    exact = {
        (r.event_type, r.p): r.quantile
        for r in exact_quantiles(ev, "event_type", "value", "event_id", probs).collect()
    }
    for r in approx_quantiles(ev, "event_type", "value", probs).collect():
        for p, got in zip(probs, r.quantiles):
            want = exact[(r.event_type, p)]
            # t-digest with accuracy 10k on ~20k rows: tight rank error
            assert abs(got - want) <= max(0.05 * abs(want), 0.5), (r.event_type, p)
