"""Snapshot reconciliation + integrity audit (north-star extension).

A pipeline that re-ingests a 100 TB corpus needs two cheap invariants:
"what changed between snapshot N-1 and N" (diff by key, for incremental
downstream work and for catching silent upstream rewrites) and "is this
copy of the data the same data" (content checksums that any engine can
recompute). Both are single-shuffle relational ops here.

The row fingerprint is the portable 48-bit md5-prefix family the dedup
tier uses (``operators/dedup.py portable_id``): bit-identical in any
engine with md5, so a DuckDB/Trino/Spark reader all agree on the
checksum of the same parquet — that is the point of an audit value.
Checksums accumulate in DECIMAL(38,0): the sum of n 48-bit values needs
48+log2(n) bits, which overflows BIGINT around n ~= 65k rows; DECIMAL is
exact to 1e38 (~2^126), i.e. any corpus size that fits a filesystem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.dedup import portable_id

# field separator for multi-column fingerprints: unit separator, absent
# from normal text; NULL encodes distinctly from any string
_SEP = "\x1f"
_NULL = "\x01null\x01"


def row_fingerprint(cols: list[Column]) -> Column:
    """48-bit portable fingerprint of a row's column values (order
    sensitive, NULL-safe: NULL never collides with a string value)."""
    parts = [F.coalesce(c.cast("string"), F.lit(_NULL)) for c in cols]
    return portable_id(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_same: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots -> (key..., status) with status in
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare col differs), ``same``.

    One full-outer join keyed on ``key_cols`` — both sides shuffle once
    on the key (zero shuffles when both snapshots are bucketed by it,
    the layout an incremental pipeline should write anyway). Values are
    compared by :func:`row_fingerprint`, so the shuffle carries one
    48-bit scalar per side, never the row payload — at 100 TB the diff
    moves ~16 bytes/row, not the corpus.

    ``same`` rows are dropped by default (the overwhelming majority in a
    healthy incremental feed); pass ``include_same=True`` for audits.
    """
    o = old.select(
        *[F.col(k) for k in key_cols],
        row_fingerprint([F.col(c) for c in compare_cols]).alias("_fp_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        row_fingerprint([F.col(c) for c in compare_cols]).alias("_fp_new"),
    )
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    out = joined.select(*key_cols, status.alias("status"))
    if not include_same:
        out = out.filter(F.col("status") != "same")
    return out


def content_checksum(
    df: DataFrame, group_cols: list[str], content_cols: list[str]
) -> DataFrame:
    """Per-group content checksum -> (group..., n_rows, checksum).

    ``checksum`` = SUM of row fingerprints as DECIMAL(38,0) cast to
    string (drivers/JSON mangle 128-bit ints; a digit string survives
    everywhere). Order-independent by construction — sum is commutative —
    so partitioning/row order never changes it, and any engine with md5
    can recompute it from the same files. One aggregation, map-side
    combined, shuffling one partial (count, sum) pair per group per
    partition.
    """
    fp = row_fingerprint([F.col(c) for c in content_cols])
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fp.cast("decimal(38,0)")).cast("decimal(38,0)").alias("_sum"),
        )
        .select(
            *group_cols, "n_rows", F.col("_sum").cast("string").alias("checksum")
        )
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC changelog to a snapshot -> the next snapshot.

    ``changes`` rows carry ``op`` in {'U' (upsert), 'D' (delete)} plus
    the full payload and ``order_cols`` (e.g. [ts, seq]) ordering
    changes per key. Semantics: the LATEST change per key wins; 'D'
    removes the key; keys without changes pass through from ``base``.

    Shape: union + one window (or equivalently one shuffle) keyed by
    ``key_cols`` — work is |base| + |changes| rows through a single
    hash exchange, and zero shuffle when base and changelog are both
    bucketed by the key (the layout a CDC pipeline should maintain).
    Base rows sort below every change via a rank column, so no
    timestamp comparison against base is needed — correct even when
    late-arriving changes carry timestamps older than the snapshot's
    watermark (last-WRITE-wins per changelog order, the Debezium/Kafka
    compaction contract).
    """
    from pyspark.sql.window import Window

    order_cols = order_cols or []
    b = base.withColumn("_rank", F.lit(0)).withColumn(op_col, F.lit("U"))
    # order cols that exist only on the changelog (seq numbers, change
    # timestamps): synthesize NULL on base — _rank already sorts every
    # change above every base row, so base's values never matter
    synthesized = [o for o in order_cols if o not in base.columns]
    for o in synthesized:
        b = b.withColumn(o, F.lit(None).cast(changes.schema[o].dataType))
    c = changes.withColumn("_rank", F.lit(1))
    allr = b.unionByName(c.select(*b.columns))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_rank").desc(), *[F.col(o).desc() for o in order_cols]
    )
    return (
        allr.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn", "_rank", op_col, *synthesized)
    )
