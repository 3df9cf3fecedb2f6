"""Checkpoint-hygiene helpers (session.py): targeted unpersist of dead
localCheckpoints, protection of session-lifetime memoized fixtures, and
the between-query sweep the bench / self-sweep harnesses run.

Why this exists: ``DataFrame.localCheckpoint`` persists the physical RDD
and nothing in the public API ever releases it, so a 570-query
one-session sweep accumulates every query's fixpoint/stream state until
LRU spill churn sets in. The sweep frees those blocks — but it must
never touch the memoized corpus/triples fixtures that LATER queries
still read (a truncated-lineage checkpoint is unrecomputable once its
blocks are gone; r8 observed exactly that failure before the protection
registry existed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.session import (
    protect_checkpoint,
    sweep_persistent_rdds,
    unpersist_checkpoint,
)


def _n_persistent(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def test_unpersist_checkpoint_releases_blocks(spark):
    sweep_persistent_rdds(spark)
    base = _n_persistent(spark)
    ck = spark.range(1000).select("id", (F.col("id") * 2).alias("y")).localCheckpoint()
    assert ck.count() == 1000
    assert _n_persistent(spark) == base + 1
    unpersist_checkpoint(ck)
    assert _n_persistent(spark) == base


def test_unpersist_checkpoint_ignores_plain_frames(spark):
    df = spark.range(10)
    unpersist_checkpoint(df)  # not checkpoint-backed: must not raise
    assert df.count() == 10


def test_sweep_skips_protected_fixtures(spark):
    sweep_persistent_rdds(spark)
    fixture = spark.range(500).select("id").localCheckpoint(eager=False)
    protect_checkpoint(fixture)
    dead = spark.range(200).select("id").localCheckpoint()
    assert dead.count() == 200
    assert fixture.count() == 500  # materialize the lazy checkpoint
    swept = sweep_persistent_rdds(spark)
    assert swept >= 1
    # the protected fixture must still be persisted AND readable
    assert _n_persistent(spark) >= 1
    assert fixture.count() == 500
    unpersist_checkpoint(fixture)


def test_memoized_corpus_survives_sweep(spark, sf_dir):
    """The q_dedup corpus memo registers itself as protected: a sweep
    between two queries that share it must not break the second one."""
    from prosnet_prefect_pipelines_spark.plans.q_dedup import corpus

    c = corpus(spark, sf_dir)
    n1 = c.count()  # materializes the lazy fixture checkpoint
    sweep_persistent_rdds(spark)
    n2 = corpus(spark, sf_dir).count()  # same memoized frame, post-sweep
    assert n1 == n2 > 0
