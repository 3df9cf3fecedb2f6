"""Distributed exact ranking (operators/distrank.py): the two-pass
range-partition rank and closed-form NTile must be BIT-IDENTICAL to the
single-partition ``Window.orderBy`` forms they replace (r8 verdict item
1 demands the fix not change hashes), across bucket-boundary shapes
(n % k == 0, n < k, ragged), descending orderings, and multi-partition
inputs.

r12: the adaptive small-row placement is gone — the protocol is fully
lazy and in-plan (one distributed plan at every scale), so the old
both-placements fixture became an API-variant parametrization: the
job-free lazy :func:`prefix_sums` and the eager wrappers must agree
with the reference window exactly; the lazy API must additionally run
ZERO Spark jobs at DataFrame-construction time (the r9 ADVICE
finding)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.distrank import (
    global_rank_prefix_sum,
    global_row_number,
    ntile_from_rn,
    ntile_from_rn_col,
    prefix_sums,
    with_global_ntile,
)


def _ids(spark, n, parts=7):
    # deterministic, shuffled-looking unique keys over `parts` partitions
    return spark.range(0, n, 1, parts).select(
        ((F.col("id") * 131) % F.lit(max(n * 2, 1))).alias("key"),
        F.col("id").alias("uid"),
    )


@pytest.mark.parametrize("api", ["eager", "lazy"])
@pytest.mark.parametrize("n", [0, 1, 2, 3, 10, 97, 1000])
def test_global_row_number_matches_window(spark, n, api):
    df = _ids(spark, n)
    order = [F.col("key").asc(), F.col("uid").asc()]
    if api == "eager":
        got, total = global_row_number(df, order, out="rn")
        assert total == n
    else:
        got = prefix_sums(df, order, rn_out="rn")
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(
        (r.key, r.uid, r.rn) for r in want.collect()
    )


@pytest.mark.parametrize("n,k", [(1, 3), (2, 3), (3, 3), (9, 3), (10, 3),
                                 (11, 3), (97, 10), (1000, 7), (5, 10)])
def test_ntile_closed_form_matches_window(spark, n, k):
    df = _ids(spark, n)
    order = [F.col("key").desc(), F.col("uid").asc()]
    got = with_global_ntile(df, order, k, "t")
    want = df.withColumn("t", F.ntile(k).over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("api", ["eager", "lazy"])
@pytest.mark.parametrize("n", [0, 1, 13, 500])
def test_global_rank_prefix_sum_matches_windows(spark, n, api):
    df = _ids(spark, n).withColumn("val", (F.col("uid") * 7 - 3).cast("long"))
    order = [F.col("key").desc(), F.col("uid").asc()]
    if api == "eager":
        got, total_rows, total_sum = global_rank_prefix_sum(
            df, order, F.col("val"), rn_out="rn", cum_out="cum"
        )
    else:
        got = prefix_sums(df, order, {"cum": F.col("val")}, rn_out="rn")
    w = Window.orderBy(*order)
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum", F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want_rows = [(r.key, r.uid, r.val, r.rn, r.cum) for r in want.collect()]
    assert sorted(
        (r.key, r.uid, r.val, r.rn, r.cum) for r in got.collect()
    ) == sorted(want_rows)
    if api == "eager":
        assert total_rows == n
        assert total_sum == sum(r[2] for r in want_rows)


def test_lazy_apis_run_no_job_at_construction(spark):
    """prefix_sums and with_global_ntile are plan constructors, not
    executors: building the DataFrame must schedule ZERO Spark jobs
    (the r9 ADVICE finding against the eager fused count job). Jobs
    triggered inside the construction window would carry the job
    group set here."""
    sc = spark.sparkContext
    group = "distrank-construction-probe"
    sc.setJobGroup(group, "construction must be job-free")
    try:
        df = _ids(spark, 1000)
        order = [F.col("key").asc(), F.col("uid").asc()]
        out1 = prefix_sums(df, order, {"cum": F.col("uid")}, rn_out="rn")
        out2 = with_global_ntile(df, order, 5, "t")
        ids = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(ids) == []
    # and the plans still execute correctly afterwards
    assert out1.count() == 1000
    assert out2.count() == 1000


def test_decimal_typed_prefix_sums(spark):
    """(Column, sql_type) value entries: decimal(38,0) running sums
    must be exact and typed on both APIs."""
    df = _ids(spark, 200).withColumn(
        "big", (F.col("uid") * 1_000_000_007).cast("long")
    )
    order = [F.col("key").asc(), F.col("uid").asc()]
    got = prefix_sums(
        df, order, {"cum": (F.col("big"), "decimal(38,0)")}, rn_out="rn"
    )
    w = Window.orderBy(*order)
    want = df.withColumn(
        "cum",
        F.sum(F.col("big").cast("decimal(38,0)")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("rn", F.row_number().over(w))
    assert sorted(
        (r.key, r.uid, r.rn, str(r.cum)) for r in got.collect()
    ) == sorted((r.key, r.uid, r.rn, str(r.cum)) for r in want.collect())


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
    # the column-form twin agrees at the same boundaries
    col_tiles = [
        r.t
        for r in rows.select(
            ntile_from_rn_col(
                F.col("rn"), F.lit(n).cast("long"), k
            ).alias("t")
        ).collect()
    ]
    assert col_tiles == tiles


@pytest.mark.parametrize("n,k", [(0, 3), (1, 3), (2, 3), (3, 3), (9, 3),
                                 (10, 3), (11, 3), (5, 10), (97, 10)])
def test_ntile_from_rn_col_matches_python_form(spark, n, k):
    rows = spark.createDataFrame(
        [(i,) for i in range(1, n + 1)] or [(None,)], "rn long"
    )
    got = [
        r.t
        for r in rows.select(
            ntile_from_rn_col(F.col("rn"), F.lit(n).cast("long"), k).alias("t")
        ).collect()
    ]
    want = [
        r.t
        for r in rows.select(ntile_from_rn(F.col("rn"), n, k).alias("t")).collect()
    ]
    assert got == want


@pytest.mark.parametrize("exclusive", [False, True])
@pytest.mark.parametrize("n", [0, 1, 2, 13, 500])
def test_prefix_max_matches_window(spark, n, exclusive):
    from prosnet_prefect_pipelines_spark.operators.distrank import prefix_max

    df = _ids(spark, n).withColumn(
        "val", ((F.col("uid") * 37) % 211 - 100).cast("long")
    )
    order = [F.col("key").asc(), F.col("uid").asc()]
    got = prefix_max(df, order, F.col("val"), "hwm", exclusive=exclusive)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1 if exclusive else 0
    )
    want = df.withColumn("hwm", F.max("val").over(w))
    assert sorted(
        (r.key, r.uid, r.val, r.hwm) for r in got.collect()
    ) == sorted((r.key, r.uid, r.val, r.hwm) for r in want.collect())


def test_prefix_max_is_job_free_at_construction(spark):
    from prosnet_prefect_pipelines_spark.operators.distrank import prefix_max

    sc = spark.sparkContext
    group = "prefix-max-construction-probe"
    sc.setJobGroup(group, "construction must be job-free")
    try:
        df = _ids(spark, 500)
        out = prefix_max(
            df,
            [F.col("key").asc(), F.col("uid").asc()],
            F.col("uid"),
            "hwm",
            exclusive=True,
        )
        ids = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(ids) == []
    assert out.count() == 500
