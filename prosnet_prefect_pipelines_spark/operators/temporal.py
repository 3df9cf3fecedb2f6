"""Temporal joins: as-of and range (capability extension).

The reference has no theta/range/as-of joins (SURVEY §2.3 note), but a
training-data/event pipeline at 100 TB needs both. Spark has no native
implementation of either; naive expressions degenerate to
BroadcastNestedLoopJoin (quadratic). These operators use the two
published scale patterns:

- **as-of** (latest right row with ``r.ts <= l.ts`` per key): union both
  sides, one shuffle on the key, and a running ``last(ignorenulls)``
  window over event time. Cost = sort within key partitions; no range
  product is ever materialized. (The same merge-by-time trick behind
  kdb's aj and pandas.merge_asof, expressed relationally.)
- **range** (point ∈ [lo, hi]): quantize intervals onto a fixed bucket
  grid, explode each interval into the buckets it covers, equi-join
  points on bucket, then apply the exact BETWEEN as a residual filter.
  Shuffle is hash(bucket) — a real equi-shuffle Catalyst can plan —
  and work scales with interval_length/bucket_width, not |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right_ts <= left_ts`` for the same key (inclusive; left join
    semantics — unmatched left rows keep NULLs).

    ``right_cols`` are carried over as ``{prefix}{col}``, plus
    ``{prefix}ts``. If several right rows share (key, ts) the one with
    the greatest (right_cols...) tuple wins — deterministic; dedup the
    right side first if another policy is needed.
    """
    rts = F.col(right_ts)
    r = right.select(
        *[F.col(k) for k in keys],
        rts.alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(rts.alias("ts"), *[F.col(c) for c in right_cols]).alias("_payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    # right rows sort before left rows at equal ts (inclusive match);
    # _payload orders right-row ties deterministically
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col("_ts"),
        F.col("_payload"),
    )
    combined = r.select(
        *[
            F.col(k) if k in keys else F.lit(None).alias(k)
            for k in (keys + [c for c in left.columns if c not in keys])
        ],
        "_side",
        "_ts",
        "_payload",
    ).unionByName(matched)
    out = combined.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = out.filter(F.col("_side") == 1).drop("_side", "_ts", "_payload")
    for c in ["ts"] + right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("_match").getField(c))
    return out.drop("_match")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``lo <= point <= hi``), as a bucketized equi-join.

    ``bucket_width`` trades replication for selectivity: each interval is
    exploded into ``(hi-lo)/width + 1`` bucket rows. Pick it near the
    median interval length so replication stays O(1) per interval while
    each bucket pairs only nearby points/intervals. All columns of both
    inputs are preserved.
    """
    # integer `div`: exact at any magnitude (no double rounding), and
    # monotonic — lo <= p <= hi implies bucket(lo) <= bucket(p) <= bucket(hi),
    # so the interval's bucket range always covers its points' buckets
    p = points.withColumn("_bucket", F.expr(f"`{point_col}` div {bucket_width}"))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{lo_col}` div {bucket_width}"),
                F.expr(f"`{hi_col}` div {bucket_width}"),
            )
        ),
    )
    return (
        p.join(i, on="_bucket")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )


def context_target_pairs(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    token_col: str,
    n_context: int = 3,
) -> DataFrame:
    """(key, context, target) next-token training pairs from per-key
    ordered sequences: for every position with >= ``n_context`` history,
    ``context`` = the previous ``n_context`` tokens space-joined,
    ``target`` = the token at the position.

    One window pass partitioned by ``key_col`` — sequences windowize
    independently and in parallel, no global order. ``order_cols`` must
    totally order rows within a key (pass a tie-break column after a
    timestamp: equal timestamps would otherwise make lag() content
    nondeterministic). The lag chain is ``n_context`` expressions over
    ONE window frame, not n window passes.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    lags = [F.lag(F.col(token_col), i).over(w) for i in range(n_context, 0, -1)]
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.concat_ws(" ", *lags).alias("context"),
            F.col(token_col).alias("target"),
            lags[0].alias("_oldest"),
        )
        .filter(F.col("_oldest").isNotNull())  # full context available
        .drop("_oldest")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of every overlapping interval pair
    (``l_lo <= r_hi AND r_lo <= l_hi``) — the interval-interval
    extension of ``range_join``'s point-in-interval.

    Both sides explode into the integer buckets they span, equi-join on
    bucket, then a residual overlap filter; ``dropDuplicates`` on the
    carried key columns is the caller's job only if an interval pair can
    meet in several buckets — here the pair is kept once via the
    canonical-bucket trick: a pair is emitted only in the FIRST bucket
    both intervals share (greatest of the two lo-buckets), so no
    dedup shuffle is needed. Work scales with actual bucket co-residency
    (choose ``bucket_width`` near the median interval length), never
    |L| x |R|.
    """
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{left_lo}` div {bucket_width}"),
                F.expr(f"`{left_hi}` div {bucket_width}"),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{right_lo}` div {bucket_width}"),
                F.expr(f"`{right_hi}` div {bucket_width}"),
            )
        ),
    )
    first_shared = F.greatest(
        F.expr(f"`{left_lo}` div {bucket_width}"),
        F.expr(f"`{right_lo}` div {bucket_width}"),
    )
    return (
        lb.join(rb, on="_bucket")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("_bucket") == first_shared)
        )
        .drop("_bucket")
    )
