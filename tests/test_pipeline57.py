"""Unit tests for batch-57: personalized PageRank, token budget trim,
shard plan."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_ppr_mass_on_seed_component(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline57 import q_ppr_seeded

    rows = q_ppr_seeded(spark, SF).collect()
    assert rows
    # all surviving ranks positive, scaled consistently
    for r in rows:
        assert r.rank_scaled > 0
        assert abs(r.rank - round(r.rank_scaled / 1e12, 6)) < 1e-9


def test_ppr_seeds_absorb_teleport(spark):
    from prosnet_prefect_pipelines_spark.operators.ranking import (
        PR_SCALE,
        personalized_pagerank,
    )

    # two disconnected 2-cycles; seed only one of them
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src long, dst long"
    )
    # even iteration count: the 2-cycle alternates mass with parity
    out = {r.node: r for r in personalized_pagerank(edges, [1], iterations=6).collect()}
    # the unseeded component receives no mass at all
    assert out[3].rank_scaled == 0 and out[4].rank_scaled == 0
    # seed keeps both the teleport term and the damped cycle return flow
    assert out[1].rank_scaled > out[2].rank_scaled > 0
    assert out[1].rank_scaled <= PR_SCALE


def test_ppr_empty_seeds_rejected(spark):
    from prosnet_prefect_pipelines_spark.operators.ranking import personalized_pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [])


def test_token_budget_trim_greedy_prefix(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline57 import (
        TOKEN_BUDGET,
        q_token_budget_trim,
    )

    rows = q_token_budget_trim(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.cum_tokens)
        # kept set is a prefix of the longest-first order
        kept_flags = [r.kept for r in rs]
        assert kept_flags == sorted(kept_flags, reverse=True)
        # every kept doc starts strictly under the budget line
        for r in rs:
            assert r.kept == (r.cum_tokens - r.n_tokens < TOKEN_BUDGET)


def test_epoch_shard_plan_covers_corpus(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline57 import (
        N_SHARDS,
        q_epoch_shard_plan,
    )
    from pyspark.sql import functions as F

    rows = q_epoch_shard_plan(spark, SF).collect()
    assert {r.shard for r in rows} <= set(range(N_SHARDS))
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    assert sum(r.n_docs for r in rows) == docs.count()
    # deterministic: a second run assigns identically
    again = {(r.shard, r.n_docs, r.tot_tokens) for r in q_epoch_shard_plan(spark, SF).collect()}
    assert again == {(r.shard, r.n_docs, r.tot_tokens) for r in rows}
