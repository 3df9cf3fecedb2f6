"""Distributed exact global ranking — the scale-safe replacement for
single-partition ``Window.orderBy(...)`` ranks.

A global ``row_number()``/``ntile()`` window with no PARTITION BY
compiles to a single-partition sort: every input row funnels through
one task, which is fine for bounded post-aggregation tables (top-k
heads, 10-row decile frames) but a scale-killer when the window input
grows with an unbounded entity dimension (one row per user, per doc).
The r8 verdict flagged exactly two such sites (``rfm_segments``,
``vocab_growth_deciles``); this module is the named fix — the two-pass
distributed rank:

1. ``repartitionByRange`` on the sort key: the SAME range exchange the
   global window's sort would perform, but the data stays spread over
   N partitions (partition i holds keys strictly below partition i+1).
2. Rank WITHIN partitions (``Window.partitionBy(partition_id)`` — a
   parallel hash exchange whose tasks are bounded by partition size).
3. Add per-partition offsets: the partition row-counts are an
   N-partition-row table, collected to the driver (bounded by the
   shuffle-partition count, never by |rows|) and broadcast back.

The result is bit-identical to the single-partition window for any
TOTAL ordering (a tie in the sort key could land rows in either range
partition, so callers must pass a tie-breaking key — the same
requirement the deterministic-hash catalog convention already imposes
on every ORDER BY).

``ntile_from_rn`` reproduces Spark's (and DuckDB's) NTile arithmetic in
closed form from (rn, n): with n rows and k buckets, the first n % k
buckets take ceil(n/k) rows, the rest floor(n/k) — exact integer
arithmetic, no window at all once rn is known.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# Adaptive placement (the connected_components/resolver pattern): below
# this row count the input is small enough that a single-partition
# window is both correct AND faster than the two-pass protocol's fixed
# overhead (range exchange + offsets job + broadcast join — measured
# +0.6-0.7 s cold per query at sf0.1 on the r22 bench, the two
# confirm-attributed regressions). The input row count is exact and
# cheap: the lazy checkpoint is materialized by one count job that
# every path needs anyway (the big path's offsets job, the callers'
# n/totals). At 100 TB the distinct-value tables blow past this and
# the distributed path engages; both paths are bit-identical
# (equivalence tests run BOTH via the env knob).
_SMALL_ROWS = int(os.environ.get("SPARK_GRAFT_DISTRANK_SMALL_ROWS", "1000000"))


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """(df + exact global row_number column, total row count).

    ``order_by`` must be a TOTAL ordering (include a unique tie-break
    column). The count comes free from the offset computation — callers
    that need n (ntile arithmetic, decile ceilings) should use it
    instead of paying a separate ``count()`` job.
    """
    ranked, n, _totals = global_prefix_sums(
        df, order_by, {}, rn_out=out, num_partitions=num_partitions
    )
    return ranked, n


def _idiv(a: Column, b: int) -> Column:
    """Exact non-negative integer a div b (b > 0): the modulo is
    subtracted first so the numerator is an exact multiple and the
    double division is exact — a raw (a/b) cast can round UP at bucket
    boundaries once a, b approach 2^31."""
    return ((a - (a % b)) / b).cast("long")


def global_prefix_sums(
    df: DataFrame,
    order_by: list[Column],
    values: dict[str, Column | tuple[Column, str]],
    rn_out: str | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, dict[str, int]]:
    """(df + optional exact global row_number + one exact running
    SUM(value) column per ``values`` entry, total rows, per-column
    totals) in ONE two-pass layout — the distributed form of

        row_number() OVER (ORDER BY ...) and
        SUM(value)   OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)

    for integer-valued columns (exact arithmetic; the per-partition
    offsets are prefix sums of the partition totals, so every running
    sum is bit-identical to the single-partition window for any total
    ordering). A values entry may be a bare Column (summed as long) or
    a (Column, sql_type) pair — pass "decimal(38,0)" for products that
    overflow a long (the catalog's exact-integer convention). The
    offset table is one groupBy over the partition id — n_partitions
    rows on the driver, never |rows|."""
    from decimal import Decimal

    names = list(values)

    def _col_dt(name):
        v = values[name]
        return v if isinstance(v, tuple) else (v, "long")

    # ONE materialization job computes the placement decision, the
    # callers' n AND every total (count + sums fused into a single agg
    # over the lazy checkpoint — the blocks then feed whichever path
    # wins without re-executing the upstream plan)
    d = df.localCheckpoint(eager=False)
    head = d.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(_col_dt(name)[0].cast(_col_dt(name)[1])).alias(f"_t{i}")
            for i, name in enumerate(names)
        ],
    ).collect()[0]
    n_rows = head["_n"]
    totals = {
        name: int(head[f"_t{i}"] or 0) for i, name in enumerate(names)
    }
    if n_rows <= _SMALL_ROWS:
        w = Window.orderBy(*order_by)
        out = d
        if rn_out:
            out = out.withColumn(
                rn_out, F.row_number().over(w).cast("long")
            )
        for name in names:
            col, dt = _col_dt(name)
            out = out.withColumn(
                name,
                F.sum(col.cast(dt)).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        return out, n_rows, totals

    dtypes = []
    parts = (
        d.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else d.repartitionByRange(*order_by)
    )
    parts = parts.sortWithinPartitions(*order_by).withColumn(
        "_gpid", F.spark_partition_id()
    )
    for i, name in enumerate(names):
        v = values[name]
        col, dt = v if isinstance(v, tuple) else (v, "long")
        dtypes.append(dt)
        parts = parts.withColumn(f"_gval{i}", col.cast(dt))
    parts = parts.localCheckpoint(eager=False)
    stats = {
        r["_gpid"]: (r["cnt"], [r[f"s{i}"] or 0 for i in range(len(names))])
        for r in parts.groupBy("_gpid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(f"_gval{i}").alias(f"s{i}") for i in range(len(names))],
        )
        .collect()
    }
    offsets, row_acc = [], 0
    sum_acc = [0] * len(names)

    def _typed(vals):
        return [
            Decimal(int(a)) if dtypes[i].startswith("decimal") else int(a)
            for i, a in enumerate(vals)
        ]

    for pid in sorted(stats):  # range partitions: pid order == key order
        offsets.append((pid, row_acc, *_typed(sum_acc)))
        row_acc += stats[pid][0]
        sum_acc = [a + b for a, b in zip(sum_acc, stats[pid][1])]
    spark = df.sparkSession
    off_schema = "_gpid int, _goff long" + "".join(
        f", _gsoff{i} {dt}" for i, dt in enumerate(dtypes)
    )
    off = spark.createDataFrame(
        offsets or [(0, 0, *_typed([0] * len(names)))], off_schema
    )
    w = Window.partitionBy("_gpid").orderBy(*order_by)
    out = parts.join(F.broadcast(off), on="_gpid")
    if rn_out:
        out = out.withColumn(
            rn_out, (F.row_number().over(w) + F.col("_goff")).cast("long")
        )
    for i, name in enumerate(names):
        out = out.withColumn(
            name,
            F.sum(f"_gval{i}").over(w.rowsBetween(Window.unboundedPreceding, 0))
            + F.col(f"_gsoff{i}"),
        )
    out = out.drop(
        "_gpid",
        "_goff",
        *[f"_gval{i}" for i in range(len(names))],
        *[f"_gsoff{i}" for i in range(len(names))],
    )
    return out, row_acc, totals


def global_rank_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    rn_out: str = "rn",
    cum_out: str = "cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Single-value convenience over :func:`global_prefix_sums`."""
    out, n, totals = global_prefix_sums(
        df, order_by, {cum_out: value}, rn_out=rn_out,
        num_partitions=num_partitions,
    )
    return out, n, totals[cum_out]


def ntile_from_rn(rn: Column, n: int, k: int) -> Column:
    """Spark/DuckDB NTile(k) from an exact global row_number: buckets
    1..(n % k) hold ceil(n/k) rows, the rest floor(n/k). Pure integer
    arithmetic on the already-distributed rn column — no window. The
    branch structure is resolved in PYTHON (n and k are driver-side
    ints) so no plan branch ever divides by zero, even under ANSI."""
    if n <= 0:
        return F.lit(None).cast("int")
    small, rem = n // k, n % k
    big = small + 1
    if rem == 0:
        return _idiv(rn - 1, small) + 1
    if small == 0:  # n < k: every row gets its own bucket
        return _idiv(rn - 1, big) + 1
    head = rem * big  # rows covered by the ceil-sized buckets
    return F.when(rn <= head, _idiv(rn - 1, big) + 1).otherwise(
        _idiv(rn - 1 - head, small) + 1 + rem
    )


def with_global_ntile(
    df: DataFrame, order_by: list[Column], k: int, out: str
) -> DataFrame:
    """df + an exact ``ntile(k) OVER (ORDER BY order_by)`` column,
    computed distributively (two bounded-parallelism exchanges + an
    N-partition-row driver hop; no single-partition stage)."""
    ranked, n = global_row_number(df, order_by, out="_gnt_rn")
    return ranked.withColumn(
        out, ntile_from_rn(F.col("_gnt_rn"), n, k).cast("int")
    ).drop("_gnt_rn")
