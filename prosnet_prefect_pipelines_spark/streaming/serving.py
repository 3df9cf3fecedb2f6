"""Steady-state serving probes for the stateful streaming monitors.

The bench's availableNow replay protocol rebuilds every monitor's state
from scratch per run — the right shape for an exact oracle, but it makes
the headline number a REBUILD cost, not the serving cost a deployed
monitor pays per micro-batch (r7 verdict finding #3: 8.9 s cold bench vs
~2 s steady-state measured in SCALE.md). These probes measure the number
that matters in production: a checkpoint-RESUMED run consuming one new
micro-batch against recovered state, exactly the restart contract
``tests/test_streaming_recovery.py`` proves correct.

Protocol per monitor (one probe = one fresh checkpoint dir):

1. REBUILD: availableNow replay over the monitor's standard staged input
   (4 micro-batches) with a persistent ``checkpointLocation`` — timed as
   ``rebuild_s`` (this is what the headline bench row also measures);
2. publish ONE new micro-batch-sized increment file (new ids — realistic
   arrivals, sized like one replay file);
3. SERVING: a second availableNow run on the SAME checkpoint — the
   offset log skips everything consumed in (1), state is recovered, and
   the run pays exactly one micro-batch of steady-state work — timed as
   ``serving_s``.

The probes reuse the monitors' own operators and (session-memoized)
static indexes, so the serving number exercises the same plan the
catalog query runs — only the measurement protocol differs.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def _publish_file(df, stage: str, name: str) -> None:
    """Write df as ONE parquet file named ``name`` inside stage (the
    file-source 'a new file arrived' event)."""
    tmp = stage + ".build"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(stage, exist_ok=True)
    os.replace(part, os.path.join(stage, name))
    shutil.rmtree(tmp, ignore_errors=True)


def neardup_serving_probe(spark, sf_dir: str, timeout_s: int = 300) -> dict:
    """{'rebuild_s', 'serving_s', 'increment_docs', 'candidate_rows'} for
    the near-dup monitor: fingerprint -> witness state -> static-index
    probe per micro-batch, resumed from checkpoint for the increment."""
    from prosnet_prefect_pipelines_spark.plans.q_dedup import corpus
    from prosnet_prefect_pipelines_spark.plans.q_pipeline113 import (
        _BUCKET_CAP,
        _static_index,
    )
    from prosnet_prefect_pipelines_spark.streaming import neardup as N

    index, sizes = _static_index(spark, sf_dir)
    odd = corpus(spark, sf_dir).filter(F.col("id") % 2 == 1).select("id", "text")

    work = tempfile.mkdtemp(prefix="nd_serving_")
    stage = os.path.join(work, "stage")
    ckpt = os.path.join(work, "ckpt")
    out_dir = os.path.join(work, "out")

    # the standard 4-micro-batch replay layout
    for i in range(4):
        _publish_file(
            odd.filter(F.col("id") % 8 == 2 * i + 1), stage, f"f{i}.parquet"
        )

    def _run() -> float:
        src = (
            spark.readStream.schema("id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        bands = N.stream_band_table(
            src, "id", "text", fanout=spark.sparkContext.defaultParallelism
        )

        def _sink(batch_df, _bid):
            batch_df.persist()
            batch_df.count()
            try:
                pairs = batch_df.filter(F.col("bkey").isNull()).select("a", "b")
                probes = batch_df.filter(F.col("bkey").isNotNull()).select(
                    F.col("a").alias("id"),
                    F.split(F.col("bkey"), r"\|", 2)
                    .getItem(0)
                    .cast("int")
                    .alias("band"),
                    F.split(F.col("bkey"), r"\|", 2).getItem(1).alias("bucket"),
                )
                cands = N.static_probe_candidates(probes, index, sizes)
                pairs.unionByName(cands).coalesce(4).write.mode("append").parquet(
                    out_dir
                )
            finally:
                batch_df.unpersist()

        t0 = time.time()
        q = (
            N.stream_state_candidates(bands, emit_bands=True)
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("neardup serving probe timed out")
        return round(time.time() - t0, 3)

    rebuild_s = _run()

    # one micro-batch of NEW documents (fresh odd ids, one file's worth)
    increment = odd.filter(F.col("id") % 8 == 1).select(
        (F.col("id") + 10_000_000).alias("id"), "text"
    )
    n_inc = increment.count()
    _publish_file(increment, stage, "f4.parquet")
    serving_s = _run()

    n_cands = spark.read.schema("a long, b long").parquet(out_dir).count()
    shutil.rmtree(work, ignore_errors=True)
    _ = _BUCKET_CAP  # probe shares the monitor's index (cap baked in)
    return {
        "rebuild_s": rebuild_s,
        "serving_s": serving_s,
        "increment_docs": n_inc,
        "candidate_rows": n_cands,
    }


def ann_serving_probe(spark, sf_dir: str, timeout_s: int = 300) -> dict:
    """{'rebuild_s', 'serving_s', 'increment_queries', 'topk_rows'} for
    the stateless ANN monitor: the restart story is the offset log
    alone, so 'rebuild' here is just the first full replay and
    'serving' is a resumed run paying exactly one new micro-batch of
    probe + cell join + top-k."""
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.operators import similarity as S
    from prosnet_prefect_pipelines_spark.plans.q_pipeline115 import (
        _K,
        _NPROBE,
        _ivf_index,
    )

    db, cents, _carr, _n_db = _ivf_index(spark, sf_dir)
    carr = S.centroid_array(cents)
    odd = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding")
    )
    work = tempfile.mkdtemp(prefix="ann_serving_")
    stage = os.path.join(work, "stage")
    ckpt = os.path.join(work, "ckpt")
    out_dir = os.path.join(work, "out")
    for i in range(4):
        _publish_file(odd.filter(F.col("vec_id") % 8 == 2 * i + 1), stage,
                      f"f{i}.parquet")

    w = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("neighbor"))

    def _run() -> float:
        src = (
            spark.readStream.schema(odd.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .repartition(spark.sparkContext.defaultParallelism)
        )
        cands = (
            src.select(
                F.col("vec_id").alias("id"),
                F.col("embedding").alias("qv"),
                S.norm(F.col("embedding")).alias("qn"),
            )
            .crossJoin(F.broadcast(carr))
            .select(
                "id", "qv", "qn",
                F.explode(
                    S.centroid_probe_column(
                        F.col("_cents"), F.col("qv"), F.col("qn"),
                        nprobe=_NPROBE,
                    )
                ).alias("_p"),
            )
            .select("id", "qv", "qn", F.col("_p.cid").alias("cell"))
            .join(db, on="cell")
            .select(
                "id", "neighbor",
                F.round(
                    S.dot(F.col("qv"), F.col("v"))
                    / (F.col("qn") * F.col("nv")),
                    6,
                ).alias("cos"),
            )
        )

        def _sink(bdf, _bid):
            (
                bdf.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= _K)
                .select("id", "neighbor", "cos")
                .coalesce(4)
                .write.mode("append")
                .parquet(out_dir)
            )

        t0 = time.time()
        q = (
            cands.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("ann serving probe timed out")
        return round(time.time() - t0, 3)

    rebuild_s = _run()
    increment = odd.filter(F.col("vec_id") % 8 == 1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    n_inc = increment.count()
    _publish_file(increment, stage, "f4.parquet")
    serving_s = _run()
    n_out = spark.read.schema("id long, neighbor long, cos double").parquet(
        out_dir
    ).count()
    shutil.rmtree(work, ignore_errors=True)
    # rebalance trigger (r9 verdict item 6): the serving probe runs the
    # |cells|-sized occupancy x traffic decision frame
    # (q_pipeline115.ann_rebalance_plan — the oracle-paired twin) and
    # reports hot/waste cell counts next to the latency, so the
    # monitor's telemetry carries the signal that schedules a centroid
    # retrain instead of leaving the report a dashboard orphan.
    t0 = time.time()
    from prosnet_prefect_pipelines_spark.plans.q_pipeline115 import (
        q_ann_rebalance_plan,
    )

    decisions = {
        r["decision"]: r["n"]
        for r in q_ann_rebalance_plan(spark, sf_dir)
        .groupBy("decision")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "rebuild_s": rebuild_s,
        "serving_s": serving_s,
        "increment_queries": n_inc,
        "topk_rows": n_out,
        "rebalance_probe_s": round(time.time() - t0, 3),
        "cells_split": int(decisions.get("split", 0)),
        "cells_merge": int(decisions.get("merge", 0)),
        "cells_keep": int(decisions.get("keep", 0)),
        "rebalance_triggered": bool(decisions.get("split", 0)),
    }


def ivfpq_serving_probe(spark, sf_dir: str, timeout_s: int = 300) -> dict:
    """{'rebuild_s', 'serving_s', 'increment_queries', 'topk_rows'} for
    the stateless IVF-PQ monitor (batch 118): same offset-log-only
    restart story as the raw-vector ANN probe, but candidates are
    n_sub-byte CODES scored by integer-exact ADC — the steady-state
    number a quantized vector server pays per arriving batch."""
    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.operators import similarity as S
    from prosnet_prefect_pipelines_spark.plans.q_pipeline118 import (
        _K,
        _PQ_SUB,
        _pq_serving_index,
    )

    xcodes, carr, cbarr, _n_index = _pq_serving_index(spark, sf_dir)
    odd = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding")
    )
    work = tempfile.mkdtemp(prefix="ivfpq_serving_")
    stage = os.path.join(work, "stage")
    ckpt = os.path.join(work, "ckpt")
    out_dir = os.path.join(work, "out")
    for i in range(4):
        _publish_file(odd.filter(F.col("vec_id") % 8 == 2 * i + 1), stage,
                      f"f{i}.parquet")

    w = Window.partitionBy("qid").orderBy(F.col("adc_cos").desc(), F.col("xid"))

    def _run() -> float:
        src = (
            spark.readStream.schema(odd.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .repartition(spark.sparkContext.defaultParallelism)
        )
        cands = (
            src.select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qv"),
                S.norm(F.col("embedding")).alias("qn"),
            )
            .crossJoin(F.broadcast(carr))
            .select(
                "qid", "qv", "qn",
                F.explode(
                    S.centroid_probe_column(
                        F.col("_cents"), F.col("qv"), F.col("qn"), nprobe=1
                    )
                ).alias("_p"),
            )
            .select(
                "qid", "qn", "qv",
                F.col("_p.cid").alias("cell"),
            )
            .crossJoin(F.broadcast(cbarr))
            .select(
                "qid", "qn", "cell",
                S.pq_query_lut(
                    F.col("qv"), F.col("_cbarr"), 64, _PQ_SUB
                ).alias("_qlut"),
            )
            .join(F.broadcast(xcodes), on="cell")
            .select("qid", "xid", S.adc_cos_lut(_PQ_SUB).alias("adc_cos"))
        )

        def _sink(bdf, _bid):
            (
                bdf.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= _K)
                .select("qid", "xid", "adc_cos")
                .coalesce(4)
                .write.mode("append")
                .parquet(out_dir)
            )

        t0 = time.time()
        q = (
            cands.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("ivfpq serving probe timed out")
        return round(time.time() - t0, 3)

    rebuild_s = _run()
    increment = odd.filter(F.col("vec_id") % 8 == 1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    n_inc = increment.count()
    _publish_file(increment, stage, "f4.parquet")
    serving_s = _run()
    n_out = spark.read.schema("qid long, xid long, adc_cos double").parquet(
        out_dir
    ).count()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "rebuild_s": rebuild_s,
        "serving_s": serving_s,
        "increment_queries": n_inc,
        "topk_rows": n_out,
    }


def preference_serving_probe(spark, sf_dir: str, timeout_s: int = 300) -> dict:
    """{'rebuild_s', 'serving_s', 'increment_docs', 'group_rows'} for
    the batch-117 preference monitor: per-group roster state recovered
    from the checkpoint, one new micro-batch of candidates folded in."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from prosnet_prefect_pipelines_spark.operators.textstats import tokens
    from prosnet_prefect_pipelines_spark.plans.q_pipeline117 import (
        _N_SHARDS,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        _group_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    work = tempfile.mkdtemp(prefix="pref_serving_")
    stage = os.path.join(work, "stage")
    ckpt = os.path.join(work, "ckpt")
    out_dir = os.path.join(work, "out")
    for i in range(4):
        _publish_file(docs.filter(F.col("doc_id") % 4 == i), stage, f"f{i}.parquet")

    def _run() -> float:
        src = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        scored = src.select(
            "lang",
            "source",
            "doc_id",
            (
                F.lit(1000) * F.size(F.array_distinct(tokens(F.col("text"))))
                - F.col("n_chars")
            ).cast("long").alias("reward"),
            "n_chars",
            F.pmod(F.xxhash64("lang", "source"), F.lit(_N_SHARDS)).alias(
                "_skey"
            ),
        )
        t0 = time.time()
        q = (
            scored.groupBy("_skey")
            .applyInPandasWithState(
                _group_stats,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("preference serving probe timed out")
        return round(time.time() - t0, 3)

    rebuild_s = _run()
    increment = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    n_inc = increment.count()
    _publish_file(increment, stage, "f4.parquet")
    serving_s = _run()
    n_groups = (
        spark.read.schema(_OUT_SCHEMA).parquet(out_dir)
        .select("lang", "source").distinct().count()
    )
    shutil.rmtree(work, ignore_errors=True)
    return {
        "rebuild_s": rebuild_s,
        "serving_s": serving_s,
        "increment_docs": n_inc,
        "group_rows": n_groups,
    }


def resolver_serving_probe(spark, sf_dir: str, timeout_s: int = 300) -> dict:
    """{'rebuild_s', 'serving_s', 'increment_edges', 'mapping_rows'} for
    the streaming entity resolver: per-batch contraction into recovered
    component state, resumed from checkpoint for the increment."""
    from prosnet_prefect_pipelines_spark.streaming.resolve import (
        IncrementalResolver,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    work = tempfile.mkdtemp(prefix="ser_serving_")
    stage = os.path.join(work, "stage")
    ckpt = os.path.join(work, "ckpt")

    for i in range(4):
        _publish_file(cust.filter(F.col("c_custkey") % 4 == i), stage, f"f{i}.parquet")

    resolver = IncrementalResolver(spark)

    def _run() -> float:
        src = (
            spark.readStream.schema(cust.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        edges = src.where(
            (F.col("c_custkey") % 10 != 1) & (F.col("c_acctbal") >= 0)
        ).select(
            F.concat(F.lit("urn:cust/"), F.col("c_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(
                F.lit("urn:cust/"), (F.col("c_custkey") - 1).cast("string")
            ).alias("dst"),
        )
        t0 = time.time()
        q = (
            edges.writeStream.foreachBatch(lambda b, _i: resolver.update(b))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("resolver serving probe timed out")
        return round(time.time() - t0, 3)

    rebuild_s = _run()

    increment = cust.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"), "c_acctbal"
    )
    n_inc = increment.count()
    _publish_file(increment, stage, "f4.parquet")
    serving_s = _run()

    n_map = resolver.mapping().count()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "rebuild_s": rebuild_s,
        "serving_s": serving_s,
        "increment_edges": n_inc,
        "mapping_rows": n_map,
    }
