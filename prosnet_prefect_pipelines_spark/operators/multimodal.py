"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension).

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched pandas functions via
``mapInPandas`` — the only place Python touches the data, and it touches
it in columnar batches, never per-row.

``decode_image`` is a REAL decoder: pure-stdlib PPM/BMP/PNG parsing
(zlib inflate + PNG filter reconstruction — no imaging libs in this
container, so the decoders are hand-rolled from the public specs).
``extract_binary_features`` is the same plumbing with a cheaper
deterministic feature set.

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


def synthesize_ppm(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic image-fixture generator -> (id, payload): a P6 PPM
    per row with width 4+id%5, height 3+id%4, pixel byte i = (id*3+i)%256.
    Pure function of the id, so an oracle can recompute every pixel —
    the in-engine stand-in for reading an image column off object
    storage. Arrow-batched like the decoders it feeds.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def make(i: int) -> bytes:
            i = int(i)
            w, h = 4 + i % 5, 3 + i % 4
            header = f"P6\n{w} {h}\n255\n".encode()
            return header + bytes((i * 3 + j) % 256 for j in range(w * h * 3))

        for pdf in it:
            yield pd.DataFrame({"id": pdf["id"], "payload": pdf["id"].map(make)})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        batches, "id long, payload binary"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image_bytes(b: bytes) -> tuple[str, int, int, int, bytes]:
    """Pure-stdlib image decode -> (format, width, height, channels,
    raw pixel bytes, channel-interleaved row-major, RGB order).

    Supported containers (no imaging libs in this environment, so the
    decoders are hand-rolled from the public format specs):
    - PPM  (P6 binary, maxval 255)
    - BMP  (24-bit uncompressed bottom-up, BGR -> RGB)
    - PNG  (8-bit gray/RGB/RGBA, zlib inflate + filter reconstruction)
    """
    if b[:2] == b"P6":
        return ("ppm", *_decode_ppm(b))
    if b[:2] == b"BM":
        return ("bmp", *_decode_bmp(b))
    if b[:8] == _PNG_SIG:
        return ("png", *_decode_png(b))
    raise ValueError(f"unsupported image container (magic {b[:8]!r})")


def _decode_ppm(b: bytes) -> tuple[int, int, int, bytes]:
    # header = "P6" then whitespace-separated width height maxval
    # (comments '#..' allowed), then a single whitespace, then raw RGB
    pos, fields = 2, []
    while len(fields) < 3:
        while b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while b[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    pixels = b[pos + 1 : pos + 1 + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM payload")
    return w, h, 3, pixels


def _decode_bmp(b: bytes) -> tuple[int, int, int, bytes]:
    import struct

    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        src = data_off + src_row * stride
        for x in range(w):
            bgr = b[src + x * 3 : src + x * 3 + 3]
            dst = (row * w + x) * 3
            out[dst], out[dst + 1], out[dst + 2] = bgr[2], bgr[1], bgr[0]
    return w, h, 3, bytes(out)


def _decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    import struct
    import zlib

    pos, idat, meta = 8, [], None
    while pos < len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0:
                raise ValueError(f"PNG depth={depth} interlace={interlace} unsupported")
            channels = {0: 1, 2: 3, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"PNG color type {color} unsupported")
            meta = (w, h, channels)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, channels = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for row in range(h):
        f = raw[row * (stride + 1)]
        line = bytearray(raw[row * (stride + 1) + 1 : (row + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            u = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 1:
                line[i] = (line[i] + a) & 0xFF
            elif f == 2:
                line[i] = (line[i] + u) & 0xFF
            elif f == 3:
                line[i] = (line[i] + (a + u) // 2) & 0xFF
            elif f == 4:
                p = a + u - c
                pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (u if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return w, h, channels, bytes(out)


DECODE_SCHEMA = (
    "id long, format string, width int, height int, channels int, "
    "sum_pixels long, n_pixels long"
)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched real image decode: parse each binary payload
    (PPM/BMP/PNG via ``decode_image_bytes``) and emit dimension + pixel
    statistics. Sum/count are exact integers so the result is
    oracle-comparable without float-rounding hazards; a feature-extract
    variant would emit the pixel array from the same batch loop.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            rows = {k: [] for k in ("id", "format", "width", "height",
                                    "channels", "sum_pixels", "n_pixels")}
            for i, payload in zip(pdf["id"], pdf[payload_col]):
                fmt, w, h, ch, pixels = decode_image_bytes(bytes(payload))
                rows["id"].append(i)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["sum_pixels"].append(sum(pixels))
                rows["n_pixels"].append(len(pixels))
            yield pd.DataFrame(rows)

    return df.select(F.col("id"), F.col(payload_col)).mapInPandas(batches, DECODE_SCHEMA)


# --- audio: WAV (RIFF/PCM) parsing ----------------------------------------

WAV_SCHEMA = (
    "id long, sample_rate int, n_channels int, bits int, n_samples long, "
    "rms_milli long, peak int"
)


def synth_wav_bytes(doc_id: int, n_samples: int = 64) -> bytes:
    """Deterministic 16-bit mono PCM WAV — a REAL RIFF container (44-byte
    canonical header), synthesized because no audio libs ship in this
    container. Sample i = ((doc_id*37 + i*101) % 4001) - 2000: a formula
    any engine can fold over, so the decode oracle derives the expected
    RMS/peak in closed SQL instead of re-parsing bytes.
    """
    import struct

    rate = 8000 + (doc_id % 4) * 4000
    samples = [((doc_id * 37 + i * 101) % 4001) - 2000 for i in range(n_samples)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Parse RIFF/PCM WAV payloads -> per-clip audio stats: sample rate,
    channel/bit layout, and integer signal statistics (RMS in
    milli-units — floor of sqrt of the exact mean square, so the value
    is engine-exact — and absolute peak).

    Arrow-batched ``mapInPandas`` like the image decoders: the header
    parse + PCM fold is genuinely imperative byte work, batched columnar
    so Python never runs per-row. Malformed payloads yield NULL stats
    rather than failing the batch (quarantine-friendly).
    """
    import math
    import struct

    def one(b: bytes):
        try:
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            fmt = struct.unpack_from("<IHHIIHH", b, 16)
            _, codec, n_ch, rate, _, _, bits = fmt
            if codec != 1 or bits != 16:
                return None
            n_bytes = struct.unpack_from("<I", b, 40)[0]
            data = b[44 : 44 + n_bytes]
            n = len(data) // 2
            sq = 0
            peak = 0
            for i in range(n):
                (s,) = struct.unpack_from("<h", data, 2 * i)
                sq += s * s
                peak = max(peak, abs(s))
            rms_milli = math.isqrt((sq * 1_000_000) // n) if n else 0
            return rate, n_ch, bits, n, rms_milli, peak
        except (struct.error, IndexError):
            return None

    id_name, payload_name = id_col, payload_col

    def part(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_name], pdf[payload_name]):
                got = one(bytes(payload) if payload is not None else b"")
                if got is None:
                    rows.append((rid, None, None, None, None, None, None))
                else:
                    rate, n_ch, bits, n, rms, peak = got
                    rows.append((rid, rate, n_ch, bits, n, rms, peak))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "sample_rate", "n_channels", "bits",
                    "n_samples", "rms_milli", "peak",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_name), F.col(payload_col).alias(payload_name)
    ).mapInPandas(part, WAV_SCHEMA)
