"""Data-layout primitives (north-star extension): Z-order clustering
keys and portable sketches' little siblings live here.

Z-ordering is the 100 TB data-skipping lever Spark itself doesn't ship
(Delta/Iceberg bolt it on): sort-or-bucket by an interleaved-bit key and
both dimensions' min/max file statistics become selective at once, so a
two-column predicate prunes files instead of scanning one dimension's
clustering and the other's full range.

The interleave is a pure integer Column expression (shift/mask/or — no
UDF), bit-identical in any engine with 64-bit integers, so layout
decisions made by one engine are reproducible by another.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-value of two non-negative ints, ``bits`` bits each ->
    one BIGINT with x's bits at even positions, y's at odd.

    Values are masked into [0, 2^bits); callers quantile-bucket raw
    columns first (rank or fixed-width bucketing) so the domain is
    dense — Z-order on sparse domains wastes curve resolution.
    """
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        acc = (
            acc.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(
                F.shiftleft(yb, 2 * i + 1)
            )
        )
    return acc


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    files: int = 64,
) -> DataFrame:
    """Simulate a Z-ordered write: assign each row to one of ``files``
    equal Z-range buckets and report each bucket's (x, y) min/max — the
    min/max column statistics a parquet footer would carry.

    The point the numbers make: under Z-layout every file covers a
    NARROW range of BOTH dimensions (vs a 1-D sort where the second
    dimension spans its full range in every file), so a conjunctive
    predicate prunes ~sqrt-fashion on each. One aggregation keyed by
    bucket; the Z-key itself is a narrow expression.
    """
    z = zorder_key(F.col(x_col), F.col(y_col), bits)
    span = 1 << (2 * bits)
    per_file = max(span // files, 1)
    bucket = F.expr(f"_z div {per_file}")
    return (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"), z.alias("_z"))
        .select("x", "y", bucket.alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
