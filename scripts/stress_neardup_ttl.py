"""Witness-state size vs event-time TTL window at the 1M-doc stress
scale (r7 verdict item 5): the near-dup monitor's production default is
event-time TTL (see streaming/neardup.stream_state_candidates and
SCALE.md), and this measures the state-size-vs-window curve that
justifies picking a window.

Setup: n docs (default 1M), stream half = n/2 docs carrying event times
spread uniformly over 60 days, staged as 4 files in day order (one
15-day quartile each -> the watermark advances per micro-batch). The
witness replays with event_ttl_ms in {5, 15, 30, unbounded} days and
reports, per window: wall time, emitted pair rows, live state shards
(numRowsTotal) and state memory (memoryUsedBytes) from the final
progress — memory is the operational metric: state holds (bkey, id, ts)
arrays per shard, so bytes track retained memberships.

Usage: python scripts/stress_neardup_ttl.py [n_docs]   # default 1,000,000
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from prosnet_prefect_pipelines_spark.session import get_spark  # noqa: E402
from prosnet_prefect_pipelines_spark.streaming import neardup as N  # noqa: E402
from stress_neardup import synth_docs  # noqa: E402

SPAN_DAYS = 60
DAY_MS = 86_400_000


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("stress_neardup_ttl")

    # stream half with an event time: day = uniform hash of id over 60d
    stream = (
        synth_docs(spark, n)
        .filter(F.col("id") % 2 == 1)
        .withColumn("_day", F.pmod(F.xxhash64("id"), F.lit(SPAN_DAYS)))
        .select(
            "id",
            "text",
            (
                F.timestamp_millis(
                    F.unix_millis(F.lit("2024-01-01 00:00:00").cast("timestamp"))
                    + F.col("_day") * F.lit(DAY_MS)
                )
            ).alias("evt"),
        )
    )

    stage = tempfile.mkdtemp(prefix="nd_ttl_stage_")
    for i in range(4):
        lo, hi = i * 15, (i + 1) * 15
        (
            stream.filter(
                (F.dayofyear("evt") - 1 >= lo) & (F.dayofyear("evt") - 1 < hi)
            )
            .coalesce(8)
            .write.mode("overwrite")
            .parquet(os.path.join(stage, f"q{i}"))
        )
        # separate subdirs won't do: the file source needs one flat dir
        # with mtime-ordered files
    flat = tempfile.mkdtemp(prefix="nd_ttl_flat_")
    import glob as _glob

    seq = 0
    for i in range(4):
        for part in sorted(
            _glob.glob(os.path.join(stage, f"q{i}", "part-*.parquet"))
        ):
            os.replace(part, os.path.join(flat, f"f{i}_{seq:03d}.parquet"))
            seq += 1
        time.sleep(1.1)  # file-source batch order follows mtime
        now = time.time()
        for f in os.listdir(flat):
            if f.startswith(f"f{i}_"):
                os.utime(os.path.join(flat, f), (now, now))
    shutil.rmtree(stage, ignore_errors=True)

    schema = spark.read.parquet(flat).schema
    n_stream = spark.read.parquet(flat).count()
    print(f"staged {n_stream:,} stream docs over {SPAN_DAYS} days in 4 files")

    results = []
    for window_days in (5, 15, 30, None):
        ckpt = tempfile.mkdtemp(prefix="nd_ttl_ckpt_")
        out = tempfile.mkdtemp(prefix="nd_ttl_out_")
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(flat)
        )
        bands = N.stream_band_table(src, "id", "text", event_time_col="evt")
        ttl_ms = window_days * DAY_MS if window_days else None
        t0 = time.time()
        q = (
            N.stream_state_candidates(bands, event_ttl_ms=ttl_ms)
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(1800), "ttl stress replay timed out"
        wall = time.time() - t0
        state_rows = state_mb = None
        for prog in reversed(q.recentProgress):
            ops = prog.get("stateOperators") or []
            if ops:
                state_rows = ops[0].get("numRowsTotal")
                state_mb = round(ops[0].get("memoryUsedBytes", 0) / 1e6, 1)
                break
        n_pairs = spark.read.schema("a long, b long").parquet(out).count()
        label = f"{window_days}d" if window_days else "unbounded"
        print(
            f"window={label:>9}: wall {wall:6.1f}s, pairs {n_pairs:,}, "
            f"live shards {state_rows}, state memory {state_mb} MB",
            flush=True,
        )
        results.append((label, wall, n_pairs, state_rows, state_mb))
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)

    print("\nstate-size-vs-window (for SCALE.md):")
    for label, wall, n_pairs, rows, mb in results:
        print(f"  {label:>9} | {mb:>8} MB | {rows} shards | {n_pairs:,} pairs | {wall:.1f}s")
    shutil.rmtree(flat, ignore_errors=True)


if __name__ == "__main__":
    main()
