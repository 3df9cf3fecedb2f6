"""Unit tests for batch-4 operators: chunking, HLL merge, PQ codes."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import sketch as SK
from prosnet_prefect_pipelines_spark.operators.similarity import pq_encode
from prosnet_prefect_pipelines_spark.operators.textstats import chunk_tokens


def test_chunk_tokens_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "id long, text string",
    )
    got = chunk_tokens(df, "id", "text", size=4, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    # doc 1: starts 0,3,6,9 -> chunks of 4,4,4,1 tokens
    assert by_doc[1] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
        (3, 1, "t9"),
    ]
    # doc 2 fits one window; the empty doc produces nothing...
    assert by_doc[2] == [(0, 2, "a b")]
    # ...except split('') yields [''] — a single empty token, one chunk
    assert by_doc.get(3, [(0, 1, "")]) == [(0, 1, "")]


def test_hll_merge_equals_direct(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    direct = {
        r.g: r.hll_estimate for r in SK.hll_distinct(df, ["g"], "k").collect()
    }
    b0 = SK.hll_registers(df.filter(F.col("k") % 2 == 0), ["g"], "k")
    b1 = SK.hll_registers(df.filter(F.col("k") % 2 == 1), ["g"], "k")
    # overlapping redelivery: merging b1 twice must change nothing (MAX)
    merged = {
        r.g: r.hll_estimate
        for r in SK.hll_estimate(
            SK.hll_merge_registers(b0, b1, b1), ["g"]
        ).collect()
    }
    assert merged == direct


def test_pq_codes_shape_and_determinism(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).astype(float).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = pq_encode(df, "vec_id", "v", dim=8, n_sub=2, n_cells=4, iterations=1)
    got = out.collect()
    assert len(got) == 400  # 200 vectors x 2 subspaces
    assert {r.sub for r in got} == {0, 1}
    assert all(0 <= r.code < 200 for r in got)  # codes are seed-vector ids
    # deterministic: a second run produces identical codes
    again = pq_encode(df, "vec_id", "v", dim=8, n_sub=2, n_cells=4, iterations=1)
    assert sorted((r.id, r.sub, r.code) for r in got) == sorted(
        (r.id, r.sub, r.code) for r in again.collect()
    )
