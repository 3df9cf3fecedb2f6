"""Distributed exact ranking (operators/distrank.py): the two-pass
range-partition rank and closed-form NTile must be BIT-IDENTICAL to the
single-partition ``Window.orderBy`` forms they replace (r8 verdict item
1 demands the fix not change hashes), across bucket-boundary shapes
(n % k == 0, n < k, ragged), descending orderings, and multi-partition
inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators import distrank
from prosnet_prefect_pipelines_spark.operators.distrank import (
    global_rank_prefix_sum,
    global_row_number,
    ntile_from_rn,
    with_global_ntile,
)


@pytest.fixture(params=["small", "distributed"])
def placement(request, monkeypatch):
    """Run every equivalence test on BOTH adaptive placements: the
    single-partition-window fast path and the two-pass distributed
    protocol (threshold 0 forces it)."""
    if request.param == "distributed":
        monkeypatch.setattr(distrank, "_SMALL_ROWS", 0)
    return request.param


def _ids(spark, n, parts=7):
    # deterministic, shuffled-looking unique keys over `parts` partitions
    return spark.range(0, n, 1, parts).select(
        ((F.col("id") * 131) % F.lit(max(n * 2, 1))).alias("key"),
        F.col("id").alias("uid"),
    )


@pytest.mark.parametrize("n", [0, 1, 2, 3, 10, 97, 1000])
def test_global_row_number_matches_window(spark, n, placement):
    df = _ids(spark, n)
    order = [F.col("key").asc(), F.col("uid").asc()]
    got, total = global_row_number(df, order, out="rn")
    assert total == n
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(
        (r.key, r.uid, r.rn) for r in want.collect()
    )


@pytest.mark.parametrize("n,k", [(1, 3), (2, 3), (3, 3), (9, 3), (10, 3),
                                 (11, 3), (97, 10), (1000, 7), (5, 10)])
def test_ntile_closed_form_matches_window(spark, n, k, placement):
    df = _ids(spark, n)
    order = [F.col("key").desc(), F.col("uid").asc()]
    got = with_global_ntile(df, order, k, "t")
    want = df.withColumn("t", F.ntile(k).over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("n", [0, 1, 13, 500])
def test_global_rank_prefix_sum_matches_windows(spark, n, placement):
    df = _ids(spark, n).withColumn("val", (F.col("uid") * 7 - 3).cast("long"))
    order = [F.col("key").desc(), F.col("uid").asc()]
    got, total_rows, total_sum = global_rank_prefix_sum(
        df, order, F.col("val"), rn_out="rn", cum_out="cum"
    )
    w = Window.orderBy(*order)
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum", F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want_rows = [(r.key, r.uid, r.val, r.rn, r.cum) for r in want.collect()]
    assert sorted(
        (r.key, r.uid, r.val, r.rn, r.cum) for r in got.collect()
    ) == sorted(want_rows)
    assert total_rows == n
    assert total_sum == sum(r[2] for r in want_rows)


def test_ntile_from_rn_boundary_exactness(spark):
    # near-2^31 rank values: the modulo-subtracted integer div must hit
    # exact bucket boundaries (a raw double (a/b) cast is not trusted
    # at this magnitude)
    n, k = 2**31 - 9, 3  # rem = 2: buckets 1-2 take big rows
    big = n // k + 1
    head = 2 * big
    rows = spark.createDataFrame(
        [(1,), (big,), (big + 1,), (head,), (head + 1,), (n,)], "rn long"
    )
    tiles = [
        r.t
        for r in rows.select(
            ntile_from_rn(F.col("rn"), n, k).alias("t")
        ).collect()
    ]
    assert (n % k, tiles) == (2, [1, 1, 2, 2, 3, 3])
