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
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


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
    return spark
