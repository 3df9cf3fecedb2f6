"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension).

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched pandas functions via
``mapInPandas`` — the only place Python touches the data, and it touches
it in columnar batches, never per-row.

The decode step itself is STUBBED (``decode_image`` raises — no imaging
libs in this container); ``extract_binary_features`` is the same plumbing
with a deterministic, oracle-checkable feature set, so the Spark-side
contract — schema, batching, partitioning — is real and tested.

Scale notes: binary payloads ride the same shuffle/spill machinery as any
column; keep batches bounded with spark.sql.execution.arrow.
maxRecordsPerBatch when payloads are large, and partition by content id
so feature extraction parallelizes evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "id long, n_bytes long, first_byte int, last_byte int, checksum long"
ADLER_MOD = 65_521


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes + metadata struct."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
        ).alias("meta"),
    )


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic features (length, boundary bytes, additive checksum)
    stand in for a real decoder; the mapInPandas contract is identical.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                    "checksum": payloads.map(lambda b: sum(b) % ADLER_MOD),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: split each payload into ``n_frames``
    contiguous byte ranges (frame i = bytes [floor(i*n/F), floor((i+1)*n/F))),
    one output row per non-empty frame — the mapInPandas shape a video
    frame-sampler uses, with byte slicing standing in for codec seeks.

    Returns (id, frame_idx, frame: binary).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                n = len(payload)
                for f in range(n_frames):
                    lo = f * n // n_frames
                    hi = (f + 1) * n // n_frames
                    if hi > lo:
                        ids.append(i)
                        idxs.append(f)
                        frames.append(bytes(payload[lo:hi]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("id", "payload").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = "id long, cells array<int>"


def resize_bytes(df: DataFrame, out_len: int = 16) -> DataFrame:
    """Resize plumbing: average-pool each payload's bytes into ``out_len``
    cells (cell j = floor(mean(bytes[floor(j*n/L) : floor((j+1)*n/L)]))) —
    the deterministic stand-in for image resize (swap the pooling for a
    real decoder + PIL.Image.resize when imaging libs exist; the
    mapInPandas contract — schema, batching — is identical).

    Payloads shorter than ``out_len`` repeat-pad conceptually by pooling
    over singleton/empty-skipped windows; empty payloads yield an empty
    cell array.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def pool(payload) -> list[int]:
            n = len(payload)
            if n == 0:
                return []
            cells = []
            for j in range(out_len):
                lo = j * n // out_len
                hi = (j + 1) * n // out_len
                if hi <= lo:
                    hi = lo + 1  # short payload: singleton window
                window = payload[lo:hi]
                cells.append(sum(window) // len(window))
            return cells

        for pdf in it:
            yield pd.DataFrame({"id": pdf["id"], "cells": pdf["payload"].map(pool)})

    return df.select("id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: real image decode (resize / frame-sample) needs imaging libs
    not present in this container. The plumbing twin is
    ``extract_binary_features``; swap the batch function when Pillow/ffmpeg
    are available."""
    raise NotImplementedError(
        "image/audio decode requires imaging libraries not present in this "
        "environment; use extract_binary_features for the plumbing contract"
    )
