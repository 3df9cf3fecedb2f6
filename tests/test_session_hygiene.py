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


def test_protection_is_app_scoped(spark):
    """Protected ids are keyed by application id (r12 ADVICE): a stale
    id recorded under a dead SparkContext must not exempt a fresh RDD
    with the colliding integer id from the sweep."""
    from prosnet_prefect_pipelines_spark.session import _PROTECTED_CKPT_IDS

    sweep_persistent_rdds(spark)
    base = _n_persistent(spark)
    ck = spark.range(300).localCheckpoint()
    assert ck.count() == 300
    rdd_id = int(ck._jdf.queryExecution().analyzed().rdd().id())
    # simulate a stale protection from a previous context: same integer
    # id, different app — the sweep must still release the block AND
    # prune the stale entry
    _PROTECTED_CKPT_IDS.add(("app-from-a-dead-context", rdd_id))
    swept = sweep_persistent_rdds(spark)
    assert swept >= 1
    assert _n_persistent(spark) == base
    assert ("app-from-a-dead-context", rdd_id) not in _PROTECTED_CKPT_IDS


def test_reset_memo_fixtures_forces_rebuild(spark, sf_dir):
    """reset_memo_fixtures returns the session to first-touch state:
    caches empty, protections dropped, blocks swept — the next corpus()
    call rebuilds rather than reusing a dangling checkpoint."""
    from prosnet_prefect_pipelines_spark.plans.q_dedup import _CORPUS_CACHE, corpus
    from prosnet_prefect_pipelines_spark.session import (
        _PROTECTED_CKPT_IDS,
        reset_memo_fixtures,
    )

    c = corpus(spark, sf_dir)
    n1 = c.count()
    assert _CORPUS_CACHE  # memoized
    reset_memo_fixtures(spark)
    assert not _CORPUS_CACHE
    assert not _PROTECTED_CKPT_IDS
    c2 = corpus(spark, sf_dir)
    assert c2 is not c  # rebuilt, not the dangling frame
    assert c2.count() == n1


def test_all_plan_memo_caches_registered(spark):
    """Every module-level *_CACHE dict in plans/ must be registered so
    reset_memo_fixtures clears it (an unregistered cache would hand out
    frames whose checkpoint blocks the reset just dropped)."""
    import glob as _glob
    import os as _os
    import re as _re

    import prosnet_prefect_pipelines_spark.plans as plans_pkg
    from prosnet_prefect_pipelines_spark.plans import catalog
    from prosnet_prefect_pipelines_spark.session import _MEMO_CACHES

    catalog.load()  # import every plan module so registrations ran

    # scan the whole package: operator/render modules may declare
    # registered caches too (e.g. render.person._EXPR_CACHE)
    pkg_dir = _os.path.dirname(_os.path.dirname(plans_pkg.__file__))
    declared = registered = 0
    for path in _glob.glob(
        _os.path.join(pkg_dir, "**", "*.py"), recursive=True
    ):
        if _os.path.basename(path) == "session.py":
            continue  # the registry itself
        src = open(path).read()
        decls = _re.findall(r"^_[A-Z_]*CACHE[^=]*=.*$", src, flags=_re.M)
        declared += len(decls)
        registered += sum("register_memo_cache" in d for d in decls)
    assert declared == registered, "cache dict declared without registration"
    assert registered == len(_MEMO_CACHES) > 0
