"""SparkSession factory tuned for the engine's workloads.

Local testing runs on ``local[N]`` (single JVM); the configuration is
nevertheless written for a multi-executor cluster at ~100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from a high initial number
- Arrow enabled for the few pandas-UDF paths (dedup/multimodal)
- session timezone pinned to UTC so timestamp semantics are stable and
  comparable with external oracles
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "prosnet_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet uses TIMESTAMP(NANOS); read as int64 nanos
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fall back from whole-stage codegen when the generated method
        # exceeds the JIT compile limit (8 KB bytecode): the triple-template
        # renderers produce ~45-branch expressions whose generated method
        # never JITs and whose Janino compile dominates runtime (observed
        # 10-90s erratic vs ~2s after)
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # whole-stage codegen OFF by default: every plan in this engine's
        # query mix is executed cold (one action per unique plan), so the
        # Janino compile of each fused stage is paid every time and never
        # amortized — measured 12-15s per giant renderer plan and 91s -> 55s
        # across the headline bench, with no query regressing (the hot
        # expressions are string/struct munging where interpreted eval ties
        # codegen even warm). On a long-lived cluster session re-running the
        # same plans, flip SPARK_GRAFT_WSCG=true to amortize the compile.
        .config(
            "spark.sql.codegen.wholeStage",
            os.environ.get("SPARK_GRAFT_WSCG", "false"),
        )
        # Python Data Source filter pushdown (sources/rest_datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    # streaming state-store backend (opt r12, VERDICT r11 item 3): at
    # 100 TB state sizes RocksDB + changelog checkpointing is the right
    # backend (state >> heap; per-commit changelogs instead of full
    # snapshots), so it is one env flip away — but it is NOT the local
    # default because the A/B at bench state sizes (hundreds of state
    # rows) measured flat-to-slower: cold x3 per monitor, HDFS-backed vs
    # RocksDB+changelog — tumbling 1.3/1.3 vs 1.9/1.9 s, preference
    # 4.2/3.9 vs 4.4/4.1 s, neardup/entity within noise
    # (artifacts/statestore_ab_r12.json). The native store's open/commit
    # overhead only amortizes when state outgrows the in-memory map.
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fan_out(df, spark: SparkSession | None = None):
    """Round-robin repartition to the session's core count.

    Use on SMALL inputs that feed expression-heavy map work (MinHash
    fingerprints, triple renderers): a local small-SF parquet file is a
    single row group, so file-split tuning (maxPartitionBytes /
    openCostInBytes) cannot raise scan parallelism — only one task can
    read the row group — and a 3-branch union of such scans runs the
    whole downstream projection on 3 of 32 cores (measured: the sf0.1
    band fingerprint at 1.57 s on the 3-partition corpus vs 0.34 s
    after fan-out). The shuffle moves the raw rows once, which is only
    worth paying when the per-row expression work dominates; at cluster
    scale a 100 TB table already arrives in thousands of row groups and
    callers should NOT fan out full-corpus scans (the helpers that use
    this do it behind session-lifetime memos or on micro-batch-sized
    frames)."""
    sess = spark or df.sparkSession
    return df.repartition(sess.sparkContext.defaultParallelism)


def unpersist_checkpoint(df) -> None:
    """Release the storage blocks behind a ``localCheckpoint``-ed frame.

    ``DataFrame.localCheckpoint`` persists the physical RDD and wraps it
    in a ``LogicalRDD``; nothing in the public API releases those blocks
    (``DataFrame.unpersist`` only talks to the CacheManager), so every
    checkpoint leaks executor storage until LRU eviction. Call this ONLY
    when the checkpointed frame is dead — i.e. every plan derived from
    it has been eagerly materialized or collected. Unpersisting while a
    lazy child still needs the blocks is unrecoverable (localCheckpoint
    truncates lineage; there is nothing to recompute from).
    Best-effort: silently ignores frames that are not checkpoint-backed.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        pass


# (app_id, rdd_id) pairs of SESSION-LIFETIME checkpointed fixtures
# (the memoized corpus / lsh-pair / triples / PQ-index views shared
# across catalog queries): sweep_persistent_rdds must never unpersist
# these — a lazy localCheckpoint that one query materialized and a
# later query reuses is unrecoverable once its blocks are dropped
# (lineage is truncated). Keyed by application id because RDD ids
# restart near 0 in a new SparkContext within the same Python process:
# a bare-int registry could collide a stale protected id with an
# unrelated fresh RDD and permanently exempt it from the sweep
# (r12 ADVICE finding).
_PROTECTED_CKPT_IDS: set[tuple[str, int]] = set()

# registered memoized-fixture caches (plan modules' per-(app_id, sf)
# dicts of checkpointed serving structures). Central registry so a
# harness can reset ALL memoized state to first-touch conditions in
# one call — see :func:`reset_memo_fixtures`.
_MEMO_CACHES: list[dict] = []


def register_memo_cache(cache: dict) -> dict:
    """Register a plan module's memoized-fixture dict; returns it so
    modules can write ``_CACHE: dict = register_memo_cache({})``."""
    _MEMO_CACHES.append(cache)
    return cache


def _app_id(spark_or_df) -> str:
    sess = getattr(spark_or_df, "sparkSession", spark_or_df)
    return sess.sparkContext.applicationId


def protect_checkpoint(df) -> None:
    """Mark a checkpointed fixture as session-lifetime (sweep-exempt)."""
    try:
        _PROTECTED_CKPT_IDS.add(
            (_app_id(df), int(df._jdf.queryExecution().analyzed().rdd().id()))
        )
    except Exception:
        pass


def reset_memo_fixtures(spark: SparkSession) -> int:
    """Reset every memoized serving structure to first-touch state.

    Clears all registered memo caches (:func:`register_memo_cache`),
    drops every checkpoint protection, and sweeps the now-unprotected
    blocks; returns the number of RDDs unpersisted. After this call the
    session measures like a fresh one for fixture/index build purposes:
    the next query that touches a memoized corpus / LSH pair frame /
    PQ index rebuilds it from scratch. The bench's repeat-cold passes
    call this so pass 2..N include the same index-build work pass 1
    paid (r10 ADVICE: memoized indexes made repeat 'cold' medians
    biased low and hid index-build regressions from the gate).
    """
    for cache in _MEMO_CACHES:
        cache.clear()
    _PROTECTED_CKPT_IDS.clear()
    return sweep_persistent_rdds(spark)


def sweep_persistent_rdds(spark: SparkSession) -> int:
    """Unpersist every non-protected persistent RDD; returns the count.

    Legal between independent queries in this engine, whose persistent
    blocks fall into exactly three classes: (1) ``localCheckpoint``
    fixpoint/stream state — dead once the owning query's result has
    been collected; (2) the memoized fixture views and serving indexes,
    which register via :func:`protect_checkpoint` and are skipped; and
    (3) the lazy distrank range blocks (``operators/distrank.py
    _ranged_parts`` persists MEMORY_AND_DISK inside the returned plan)
    plus the near-dup monitor's foreachBatch barrier — both dead after
    their query's action completes, and released HERE: the distrank
    APIs are deliberately job-free at construction so they cannot
    unpersist deterministically themselves, and their contract is
    caller-must-sweep (harnesses call this between queries; long-lived
    embedding servers must do the same or accumulate one range block
    per distrank plan executed). Stale protections from stopped
    SparkContexts are pruned by app id — they can never match again.
    """
    n = 0
    try:
        app = spark.sparkContext.applicationId
        stale = {t for t in _PROTECTED_CKPT_IDS if t[0] != app}
        _PROTECTED_CKPT_IDS.difference_update(stale)
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if (app, int(e.getKey())) in _PROTECTED_CKPT_IDS:
                continue
            e.getValue().unpersist(False)
            n += 1
    except Exception:
        pass
    return n


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf we rely on, on a session we did not build.

    The driver hands us its own SparkSession; timestamp comparisons against
    the DuckDB oracle (UTC-naive) require a UTC session timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    # default; read the physical int64 and handle nanos ourselves
    # (model.read_events) — exact in both engines.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    # cold-plan workload: skip whole-stage codegen compile (see get_spark)
    spark.conf.set(
        "spark.sql.codegen.wholeStage", os.environ.get("SPARK_GRAFT_WSCG", "false")
    )
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf on some builds; get_spark sets it at build time
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        # runtime-settable: StreamExecution clones the conf at query start
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    return spark
