"""Unit tests for batch-6 operators: BPE golden values, linkage,
compaction/winsorize edge behavior."""

from __future__ import annotations

from prosnet_prefect_pipelines_spark.operators.lm import bpe_segment, bpe_train


def test_bpe_golden_merges(spark):
    # the classic Sennrich corpus shape: 'lo' dominates, then 'low'
    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, "text", n_merges=4)
    assert merges == [
        (0, "l", "o", 5),
        (1, "lo", "w", 5),
        (2, "e", "w", 3),
        (3, "n", "ew", 3),
    ]
    got = {
        r.id: (r.n_tokens, r.n_pieces, r.pieces)
        for r in bpe_segment(df, "doc_id", "text", merges).collect()
    }
    assert got[1] == (5, 10, "low low low low e r low e s t")
    assert got[2] == (3, 8, "new new e r new e s t")


def test_bpe_empty_and_exhausted(spark):
    df = spark.createDataFrame([(1, "a a"), (2, "")], "doc_id long, text string")
    # single-char vocab: no pairs to merge -> trainer stops early
    assert bpe_train(df, "text", n_merges=5) == []
    got = {r.id: r.n_pieces for r in bpe_segment(df, "doc_id", "text", []).collect()}
    assert got == {1: 2, 2: 0}  # whitespace-split: empty doc -> no pieces


def test_decode_wav_roundtrip_and_malformed(spark):
    from prosnet_prefect_pipelines_spark.operators.multimodal import (
        decode_wav,
        synth_wav_bytes,
    )

    rows = [(7, synth_wav_bytes(7)), (8, b"not a wav"), (9, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in decode_wav(df).collect()}
    assert got[7].sample_rate == 8000 + (7 % 4) * 4000
    assert got[7].n_samples == 64 and got[7].bits == 16
    samples = [((7 * 37 + i * 101) % 4001) - 2000 for i in range(64)]
    import math

    assert got[7].peak == max(abs(s) for s in samples)
    assert got[7].rms_milli == math.isqrt(
        sum(s * s for s in samples) * 1_000_000 // 64
    )
    assert got[8].sample_rate is None and got[9].sample_rate is None


def test_manifest_isolation_and_time_travel(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.sinks import manifest_commit, read_snapshot

    table = str(tmp_path / "tbl")
    v1 = manifest_commit(spark.range(10), table)
    v2 = manifest_commit(spark.range(10, 15), table)
    assert (v1, v2) == (1, 2)
    # an orphan directory (failed writer) must be invisible to readers
    import os

    os.makedirs(os.path.join(table, "commit-99"), exist_ok=True)
    spark.range(1000).write.mode("overwrite").parquet(
        os.path.join(table, "commit-99")
    )
    assert read_snapshot(spark, table, 1).count() == 10
    assert read_snapshot(spark, table, 2).count() == 15  # latest == v2
    assert read_snapshot(spark, table).count() == 15
