"""Unit tests for batch-32: Winnowing (MOSS) fingerprints."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _brute_winnow(toks, hashes, k=3, w=4):
    """Direct per-window argmin (the paper's definition): for every
    window of w consecutive k-gram hashes pick the min, rightmost tie."""
    n = len(toks) - k + 1
    if n <= 0:
        return set()
    starts = range(1, max(n - w + 1, 1) + 1)
    out = set()
    for s in starts:
        window = [(hashes[p], -p, p) for p in range(s, min(s + w - 1, n) + 1)]
        h, _, p = min(window)
        out.add((p, h))
    return out


def test_winnowing_matches_paper_definition(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline32 import (
        _K,
        _W,
        q_winnowing_fingerprints,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import _hash48
    from pyspark.sql import functions as F

    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # portable 48-bit hash of each gram, computed through Spark itself so
    # the reference uses byte-identical hashes
    rows = []
    for doc_id, toks in docs.items():
        for p in range(1, len(toks) - _K + 2):
            rows.append((doc_id, p, " ".join(toks[p - 1 : p - 1 + _K])))
    gram_df = spark.createDataFrame(rows, "doc_id long, p long, gram string").select(
        "doc_id", "p", (_hash48(F.col("gram"), "wn") % 1099511627776).alias("h")
    )
    hashes: dict[int, dict[int, int]] = {}
    for r in gram_df.collect():
        hashes.setdefault(r.doc_id, {})[r.p] = r.h

    got: dict[int, set] = {}
    for r in q_winnowing_fingerprints(spark, SF).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, toks in docs.items():
        want = _brute_winnow(toks, hashes.get(doc_id, {}), _K, _W)
        assert got.get(doc_id, set()) == want, f"doc {doc_id}"


def test_winnow_guarantee_on_shared_substring(spark):
    """Two docs sharing a >= w+k-1 token substring MUST share a
    fingerprint (the winnowing guarantee) — check via the overlap
    query on a pair of duplicated docs."""
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline32 import (
        _fingerprints,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    # duplicate each doc under a shifted id -> guaranteed shared text
    pair = docs.select("doc_id", "text").unionAll(
        docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    pair.createOrReplaceTempView("_w_docs")
    import tempfile

    d = tempfile.mkdtemp()
    pair.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    fps = _fingerprints(spark, d)
    uniq = fps.select("doc_id", "fp").distinct()
    a, b = uniq.alias("a"), uniq.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") + 1000 == F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
        .count()
    )
    assert shared == 5  # every original shares >= 1 fp with its copy
