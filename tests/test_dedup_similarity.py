"""Unit tests for the dedup / similarity operator families (north-star
extensions; SURVEY §7 step 10) on tiny in-memory corpora.

The catalog queries check these value-for-value against DuckDB at
sf0.01; here we check the algorithmic relationships the oracles can't:
approximate results are subsets of / consistent with the exact ones.
"""

from __future__ import annotations

import math

import pytest

from prosnet_prefect_pipelines_spark.operators import dedup as D
from prosnet_prefect_pipelines_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    # Two tight clusters around orthogonal axes + one outlier.
    base_a = [1.0, 0.1, 0.0, 0.05]
    base_b = [0.0, 1.0, 0.1, 0.0]
    rows = [
        (1, [x + 0.00 for x in base_a]),
        (2, [x + 0.01 for x in base_a]),
        (3, [x - 0.01 for x in base_a]),
        (4, [x + 0.00 for x in base_b]),
        (5, [x + 0.02 for x in base_b]),
        (6, [0.5, -0.5, 0.5, -0.5]),
    ]
    return spark.createDataFrame(rows, "id long, v array<float>")


def _py_cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_cosine_topk_matches_python(vectors):
    got = {
        (r.id, r.neighbor): r.cos
        for r in S.cosine_topk(vectors, "id", "v", k=1).collect()
    }
    rows = {r.id: [float(x) for x in r.v] for r in vectors.collect()}
    for i, vi in rows.items():
        best = max(
            ((j, _py_cos(vi, vj)) for j, vj in rows.items() if j != i),
            key=lambda t: (round(t[1], 6), -t[0]),
        )
        assert (i, best[0]) in got
        assert got[(i, best[0])] == pytest.approx(best[1], abs=1e-6)


def test_ivf_topk_matches_python_semantics(vectors):
    rows = {r.id: [float(x) for x in r.v] for r in vectors.collect()}
    # centroids = the n_cells smallest ids; assignment = argmax rounded
    # cosine, ties broken by centroid id (the operator's contract)
    cents = sorted(rows)[:2]
    cell = {
        i: max(cents, key=lambda c: (round(_py_cos(v, rows[c]), 6), -c))
        for i, v in rows.items()
    }
    expected = {
        (i, j)
        for i in rows
        for j in rows
        if i != j and cell[i] == cell[j]
    }
    ivf = S.ivf_topk(vectors, "id", "v", k=5, n_cells=2).collect()
    assert {(r.id, r.neighbor) for r in ivf} == expected
    # approximate cosines are still the exact cosines of the kept pairs
    brute = {
        (r.id, r.neighbor): r.cos
        for r in S.cosine_topk(vectors, "id", "v", k=5).collect()
    }
    for r in ivf:
        assert r.cos == brute[(r.id, r.neighbor)]


def test_embedding_cosine_brute_finds_cluster_pairs(vectors):
    pairs = D.embedding_cosine_pairs(
        vectors, "id", "v", dim=4, threshold=0.99, mode="brute"
    ).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (4, 5) in got
    # cross-cluster / outlier pairs excluded
    assert all(a in (1, 2, 3) and b in (1, 2, 3) or a in (4, 5) for a, b in got)


def test_embedding_cosine_lsh_subset_of_brute(vectors):
    brute = {
        (r.a, r.b): r.cos
        for r in D.embedding_cosine_pairs(
            vectors, "id", "v", dim=4, threshold=0.9, mode="brute"
        ).collect()
    }
    lsh = D.embedding_cosine_pairs(
        vectors, "id", "v", dim=4, threshold=0.9, planes=2, mode="lsh"
    ).collect()
    for r in lsh:
        assert (r.a, r.b) in brute
        assert r.cos == brute[(r.a, r.b)]


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y")], "id long, text string"
    )
    rows = {r.keeper: r.n_copies for r in D.exact_dedup(df, "id", "text").collect()}
    assert rows == {1: 2, 3: 1}


def test_sample_frames_cover_payload_exactly(spark):
    from prosnet_prefect_pipelines_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    payload = M.attach_binary_payload(df, "doc_id", "text")
    rows = M.sample_frames(payload, n_frames=4).collect()
    by_id = {}
    for r in sorted(rows, key=lambda r: (r.id, r.frame_idx)):
        by_id.setdefault(r.id, []).append(bytes(r.frame))
    # frames are contiguous, non-overlapping, and reassemble the payload
    assert b"".join(by_id[1]) == b"abcdefghij"
    assert len(by_id[1]) == 4
    # short payload: only non-empty frames emitted
    assert b"".join(by_id[2]) == b"xy"
    assert len(by_id[2]) == 2
    assert 3 not in by_id  # empty payload -> no frames


def _png_bytes(w, h, pixels, color_type=2, filters=None):
    """Minimal PNG writer for decoder tests (zlib + manual chunks)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * channels

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    filters = filters or [0] * h
    raw = b""
    prev = bytes(stride)
    for row in range(h):
        line = bytes(pixels[row * stride : (row + 1) * stride])
        f = filters[row]
        enc = bytearray(line)
        for i in reversed(range(stride)):
            a = line[i - channels] if i >= channels else 0
            u = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - u) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - (a + u) // 2) & 0xFF
            elif f == 4:
                p = a + u - c
                pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (u if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_bytes(w, h, pixels):
    """Minimal 24-bit bottom-up BMP writer (RGB in, BGR rows out)."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(range(h)):
        line = bytearray()
        for x in range(w):
            r, g, b = pixels[(row * w + x) * 3 : (row * w + x) * 3 + 3]
            line += bytes([b, g, r])
        line += bytes(stride - w * 3)
        body += line
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def test_decode_image_bytes_all_formats():
    from prosnet_prefect_pipelines_spark.operators.multimodal import decode_image_bytes

    pixels = bytes(range(2 * 3 * 3))  # 2x3 RGB, 18 distinct bytes

    ppm = b"P6\n# a comment\n2 3\n255\n" + pixels
    assert decode_image_bytes(ppm) == ("ppm", 2, 3, 3, pixels)

    assert decode_image_bytes(_bmp_bytes(2, 3, pixels)) == ("bmp", 2, 3, 3, pixels)

    # every PNG filter type must reconstruct exactly
    for filters in ([0, 0, 0], [1, 2, 3], [4, 4, 4], [0, 4, 2]):
        png = _png_bytes(2, 3, pixels, filters=filters)
        assert decode_image_bytes(png) == ("png", 2, 3, 3, pixels), filters
    # grayscale and RGBA channel counts
    gray = bytes(range(6))
    assert decode_image_bytes(_png_bytes(2, 3, gray, color_type=0)) == ("png", 2, 3, 1, gray)
    rgba = bytes(range(24))
    assert decode_image_bytes(_png_bytes(2, 3, rgba, color_type=6)) == ("png", 2, 3, 4, rgba)


def test_decode_image_dataframe(spark):
    from prosnet_prefect_pipelines_spark.operators import multimodal as M

    df = spark.createDataFrame([(7,), (12,)], "doc_id long")
    out = {r.id: r for r in M.decode_image(M.synthesize_ppm(df, "doc_id")).collect()}
    for i in (7, 12):
        w, h = 4 + i % 5, 3 + i % 4
        r = out[i]
        assert (r.format, r.width, r.height, r.channels) == ("ppm", w, h, 3)
        assert r.n_pixels == w * h * 3
        assert r.sum_pixels == sum((i * 3 + j) % 256 for j in range(w * h * 3))


def test_resize_bytes_average_pool(spark):
    from prosnet_prefect_pipelines_spark.operators import multimodal as M

    df = spark.createDataFrame([(1, "aabb"), (2, "")], "doc_id long, text string")
    payload = M.attach_binary_payload(df, "doc_id", "text")
    got = {r.id: r.cells for r in M.resize_bytes(payload, out_len=2).collect()}
    assert got[1] == [ord("a"), ord("b")]
    assert got[2] == []


def test_ivf_multiprobe_improves_recall(spark, sf_dir):
    from prosnet_prefect_pipelines_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id, r.neighbor)
        for r in S.cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }

    def recall(nprobe):
        approx = {
            (r.id, r.neighbor)
            for r in S.ivf_topk(
                emb, "vec_id", "embedding", k=5, n_cells=8, nprobe=nprobe
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    # probing the 2nd-nearest cell must not hurt and should help; the
    # absolute ceiling is corpus-dependent (near-random embeddings spread
    # true neighbors across many Voronoi cells)
    assert r2 >= r1
    assert r2 >= 0.25


def test_auto_planes_scales_with_corpus():
    # bucket count (2^planes) tracks N/target: each 2x of N adds a plane
    assert S.auto_planes(500, target_bucket=64) == 4      # floor
    assert S.auto_planes(100_000, target_bucket=64) == 11
    assert S.auto_planes(200_000, target_bucket=64) == 12
    assert S.auto_planes(1_000_000_000, target_bucket=64) == 24
    # candidate work stays ~N*target: 2^planes >= N/(2*target) always
    for n in (10, 1_000, 10**6, 10**9):
        assert 2 ** S.auto_planes(n) >= n / (2 * 64)


def test_rhp_lsh_multitable_recall_and_dedup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id, r.neighbor)
        for r in S.cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }

    def run(**kw):
        rows = S.rhp_lsh_topk(emb, "vec_id", "embedding", dim=64, k=5, **kw).collect()
        pairs = [(r.id, r.neighbor) for r in rows]
        assert len(pairs) == len(set(pairs)), "multi-table collisions must dedup"
        return len(set(pairs) & exact) / len(exact)

    r1 = run(planes=4, tables=1)
    r2 = run(planes=4, tables=2)
    assert r2 >= r1, "a second hash table must not lose candidates"
    # absolute ceiling is corpus-dependent (near-random embeddings);
    # monotonicity is the contract, the floor just guards against a
    # broken signature wiping the candidate set
    assert r2 >= 0.2
    # the skew cap trades bounded work for recall but must stay sane
    r2c = run(planes=4, tables=2, bucket_cap=32)
    assert r2c >= 0.15


def test_portable_id_matches_python_md5(spark):
    """portable_id == int(md5(s).hexdigest()[:12], 16) for arbitrary
    strings — the cross-engine contract the dedup oracles rely on."""
    import hashlib

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators.dedup import portable_id

    samples = ["", "a", "hello world", "ümlaut ünïcode", "x" * 1000,
               "tab\tnewline\n", "ça va 漢字"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.sid for r in df.select("s", portable_id(F.col("s")).alias("sid")).collect()}
    for s in samples:
        expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)
        assert got[s] == expected, s


def test_kmeans_centroids_improve_assignment_objective(spark, sf_dir):
    """Lloyd's iterations must not worsen the mean best-cosine objective
    relative to the raw seed centroids, and must find the two planted
    clusters on a separable corpus."""
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators import similarity as S

    # separable corpus: two tight clusters, ids interleaved so the seed
    # centroids (2 lowest ids) start inside DIFFERENT clusters
    rows = []
    for i in range(30):
        base = [1.0, 0.05, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.05, 1.0, 0.0]
        rows.append((i, [x + (i % 5) * 0.01 for x in base]))
    df = spark.createDataFrame(rows, "id long, v array<float>")

    def objective(cents):
        scored = df.join(F.broadcast(cents)).select(
            "id", S.cosine(F.col("v"), F.col("cv")).alias("c")
        )
        return (
            scored.groupBy("id").agg(F.max("c").alias("best"))
            .agg(F.avg("best")).collect()[0][0]
        )

    seed = df.orderBy("id").limit(2).select(
        F.col("id").alias("cid"), F.col("v").alias("cv"))
    trained = S.kmeans_centroids(df, "id", "v", n_cells=2, iterations=4)
    assert trained.count() == 2
    assert objective(trained) >= objective(seed) - 1e-9
    assert objective(trained) > 0.995  # near-perfect fit on separable data


def test_shingle_modes_equivalent(spark):
    """Arrow and expression shinglers must produce identical tables,
    including the short/empty/whitespace edge cases."""
    rows = [
        (1, "a b c d e"),
        (2, "one two"),          # shorter than k
        (3, ""),                 # empty
        (4, "   padded   text   here   "),
        (5, "tab\tsep\nnewline mix"),
        (6, "x"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for k in (2, 3):
        arrow = {(r.id, r.shingle) for r in D.shingle_table(df, "id", "text", k).collect()}
        expr = {
            (r.id, r.shingle)
            for r in D.shingle_table(df, "id", "text", k, mode="expr").collect()
        }
        assert arrow == expr, k


def test_ann_recall_report_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_similarity import q_ann_recall_report

    r = q_ann_recall_report(spark, "/root/testdata/sf0.001").first()
    assert 0 <= r.n_hit <= r.n_exact
    assert r.recall_ppm == r.n_hit * 1000000 // r.n_exact


def test_minhash_bucket_cap_bounds_flood(spark):
    """Duplicate flood: 60 identical docs + 40 distinct. Uncapped, the
    band self-join yields the full 60*59/2 flood quadratic; with
    bucket_cap the candidate count is bounded and every returned pair
    is still a true >=threshold pair (precision stays exact because
    verification is unchanged)."""
    from pyspark.sql import functions as F

    rows = [(i, "the same flooded text body repeated verbatim") for i in range(60)]
    rows += [(100 + i, f"distinct document number {i} with words {i*7} {i*13}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string")

    uncapped = D.minhash_lsh_pairs(
        df, "id", "text", k=3, num_hashes=12, bands=4, threshold=0.9,
        hash_mode="fast",
    )
    assert uncapped.count() == 60 * 59 // 2

    capped = D.minhash_lsh_pairs(
        df, "id", "text", k=3, num_hashes=12, bands=4, threshold=0.9,
        hash_mode="fast", bucket_cap=8,
    )
    got = capped.collect()
    # bounded: far below the flood quadratic, and every pair is real
    assert 0 < len(got) < 60 * 59 // 2
    assert all(r.a < 60 and r.b < 60 and r.jaccard == 1.0 for r in got)


def test_minhash_band_buckets_matches_python_reference(spark):
    """The per-row band expression == a pure-Python minhash reference
    (shingling, portable md5-prefix ids, (2j+1)s+97j+13 mod P mins,
    3-row band concatenation) on arbitrary texts — including the
    n < k whole-text fallback and duplicate-shingle multiplicity."""
    import hashlib

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators.dedup import (
        PRIME,
        minhash_band_buckets,
    )

    def py_buckets(text: str, k=3, num_hashes=12, bands=4):
        w = text.strip().split()
        if len(w) >= k:
            sh = [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]
        else:
            sh = [" ".join(w)]
        sids = [int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in sh]
        mins = [
            min(((2 * j + 1) * s + 97 * j + 13) % PRIME for s in sids)
            for j in range(num_hashes)
        ]
        r = num_hashes // bands
        return [
            "_".join(str(mins[b * r + i]) for i in range(r)) for b in range(bands)
        ]

    samples = [
        "",
        "one",
        "one two",
        "one two three",
        "the quick brown fox jumps over the lazy dog",
        "dup dup dup dup dup",
        "  padded   with   runs\tof\nwhitespace  ",
        "ümlaut ünïcode 漢字 mixé " * 5,
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, s string")
    got = {
        r.i: list(r.bk)
        for r in df.select("i", minhash_band_buckets(F.col("s")).alias("bk")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == py_buckets(s), repr(s)
