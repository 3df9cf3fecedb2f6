"""Structured Streaming twins of the batch window operators.

The reference has no true streaming (SURVEY §2.10) — these prove the
engine's streaming path: parquet source -> watermark -> windowed /
session aggregation -> memory or foreachBatch sink, driven to completion
with availableNow + processAllAvailable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

import shutil

import pytest


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # streaming file sources require a directory
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def _ts_us(schema):
    """Event-time micros for either physical ts schema the driver has
    shipped (int64 nanos under nanosAsLong, or TIMESTAMP(MICROS))."""
    if isinstance(schema["ts"].dataType, T.LongType):
        return F.expr("ts div 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    raw = spark.readStream.schema(schema).parquet(events_dir)
    return raw.withColumn("ts_event", F.timestamp_micros(_ts_us(schema)))


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    agg = (
        _stream(spark, events_dir)
        .withWatermark("ts_event", "2 hours")
        .groupBy(F.window("ts_event", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("tumbling_out")
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window.start.isoformat(), r.event_type): r.n
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    # batch twin over the same file
    batch_src = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = (
        batch_src.withColumn("ts_event", F.timestamp_micros(_ts_us(batch_src.schema)))
        .groupBy(F.window("ts_event", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {
        (r.window.start.isoformat(), r.event_type): r.n for r in batch.collect()
    }
    # append-mode emits only windows closed by the final watermark; with
    # availableNow the last watermark covers all data except the tail
    assert got, "no windows emitted"
    assert set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) - 20  # only trailing windows may be open


def test_streaming_session_window(spark, events_dir):
    agg = (
        _stream(spark, events_dir)
        .withWatermark("ts_event", "1 hour")
        .groupBy(F.session_window("ts_event", "15 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("session_out")
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert len(rows) > 100
    # session integrity: no zero-length negative sessions, counts positive
    assert all(r.n > 0 for r in rows)


def test_streaming_foreach_batch_upsert(spark, events_dir, tmp_path):
    """T2 as a streaming sink: foreachBatch upsert-by-key into a dict."""
    state: dict = {}

    def upsert(batch_df, epoch_id):
        for r in batch_df.collect():
            cur = state.get(r.user_id)
            if cur is None or r.max_ts > cur:
                state[r.user_id] = r.max_ts

    agg = (
        _stream(spark, events_dir)
        .groupBy("user_id")
        .agg(F.max("ts_event").alias("max_ts"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    n_users = (
        spark.read.parquet(events_dir).select("user_id").distinct().count()
    )
    assert len(state) == n_users


def test_stateful_lww_across_microbatches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    two files forced into separate batches (maxFilesPerTrigger=1); a later
    batch only wins where its event time (then id) is greater."""
    import pandas as pd
    import uuid as _uuid

    from prosnet_prefect_pipelines_spark.streaming.stateful import (
        last_write_wins_state,
    )

    d = tmp_path / "ev"
    d.mkdir()
    # batch 1: users 1,2; batch 2: user 1 older event (must NOT win),
    # user 2 newer event (must win), user 3 fresh
    pd.DataFrame(
        {"user_id": [1, 2], "event_id": [10, 20], "event_type": ["a", "a"],
         "ts_us": [100, 200]}
    ).to_parquet(d / "0.parquet")
    pd.DataFrame(
        {"user_id": [1, 2, 3], "event_id": [11, 21, 30],
         "event_type": ["b", "b", "b"], "ts_us": [50, 300, 10]}
    ).to_parquet(d / "1.parquet")

    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    name = f"lww_test_{_uuid.uuid4().hex[:8]}"
    q = (
        last_write_wins_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    rows = spark.table(name).collect()
    # per-key winners only ever grow by (ts, id) — the final state is the
    # max, independent of sink row order
    final = {}
    for r in rows:
        cand = (r.ts_us, r.event_id, r.event_type)
        if r.user_id not in final or cand[:2] > final[r.user_id][:2]:
            final[r.user_id] = cand
    assert final[1] == (100, 10, "a")   # older batch-2 event did not win
    assert final[2] == (300, 21, "b")   # newer batch-2 event won
    assert final[3] == (10, 30, "b")


def test_watermark_store_incremental_runs(spark, tmp_path):
    """Two scheduled runs over a growing table: the second run reads only
    rows after (stored watermark - overlap); a missed-cadence gap still
    catches up because the mark advances to the data max, not to now."""
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.streaming.incremental import (
        US_PER_DAY,
        WatermarkStore,
        incremental_run,
    )

    store = WatermarkStore(str(tmp_path / "wm.json"))
    day = US_PER_DAY

    batch1 = spark.createDataFrame(
        [(1, 1 * day), (2, 3 * day), (3, 5 * day)], "id long, ts long"
    )
    out1, commit1 = incremental_run(batch1, "ts", store, overlap_days=1)
    assert out1.count() == 3            # first run: full load
    assert store.read() is None         # mark not advanced until commit
    commit1()
    assert store.read() == 5 * day

    # next run sees old rows + new ones; only rows after (5d - 1d) flow
    batch2 = batch1.unionByName(
        spark.createDataFrame([(4, 6 * day), (5, 9 * day)], "id long, ts long")
    )
    out2, commit2 = incremental_run(batch2, "ts", store, overlap_days=1)
    got = {r.id for r in out2.collect()}
    assert got == {3, 4, 5}             # id=3 redelivered inside the overlap

    # sink failure = no commit: the next run re-reads the WHOLE failed
    # batch (at-least-once), not just the overlap window
    out2b, commit2b = incremental_run(batch2, "ts", store, overlap_days=1)
    assert {r.id for r in out2b.collect()} == {3, 4, 5}
    commit2b()
    assert store.read() == 9 * day

    # idempotence: rerunning the same batch redelivers only the overlap,
    # and an upsert sink keyed by id absorbs it
    out3, _ = incremental_run(batch2, "ts", store, overlap_days=1)
    assert {r.id for r in out3.collect()} == {5}
