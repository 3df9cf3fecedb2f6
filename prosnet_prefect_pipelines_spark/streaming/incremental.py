"""Incremental refresh semantics (SURVEY §2.10 T1-T2).

The reference runs daily crons re-fetching entities with
``dateModified > now - 2 days`` (wikidata_index.py:159-167,
prefect.yaml:121 ``incremental_date: 2``) — a window deliberately wider
than the cadence — and makes redelivery idempotent with upsert-by-id
sinks (push_to_typesense.py:49-51).

Engine shape: a high-watermark predicate (pushed down to the scan) plus
last-write-wins dedup per upsert key. At 100 TB the watermark predicate
prunes partitions when the table is date-partitioned; the dedup is a
single shuffle on the upsert key (or zero shuffle if the source is
bucketed by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_DAY = 86_400 * 1_000_000


def incremental_window(df: DataFrame, ts_col: str, window_days: int) -> DataFrame:
    """Rows newer than (max ts - window). T1: the re-read overlap window.

    The reference anchors on wall-clock ``now``; for deterministic testing
    we anchor on the data's max timestamp — same predicate shape, and the
    filter still pushes down (the watermark is a scalar).
    """
    hi = df.agg(F.max(ts_col).alias("_hi"))
    return df.join(F.broadcast(hi)).filter(
        F.col(ts_col) > F.col("_hi") - F.lit(window_days * US_PER_DAY)
    ).drop("_hi")


def upsert_dedup(df: DataFrame, key_cols: list[str], ts_col: str, tiebreak: str) -> DataFrame:
    """Last-write-wins per key (T2 idempotent upsert semantics).

    Deterministic: latest ``ts_col`` wins, ties broken by ``tiebreak``.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def refresh_materialized_agg(
    spark,
    base_path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Incrementally maintain a materialized count/sum aggregate: combine
    the existing materialization with the batch's PARTIAL aggregate and
    atomically replace the store — per refresh, work is proportional to
    |batch| + |distinct keys|, never to history (the reason materialized
    views exist at 100 TB: reprocessing a year of facts to update a daily
    rollup is the anti-pattern this replaces).

    ``sum_cols``: {out_col: in_col} summed alongside the row count ``n``.
    The swap is write-new-then-rename (atomic on a posix fs; object
    stores swap a manifest instead). Returns the refreshed aggregate.
    """
    import os
    import shutil

    sums = sum_cols or {}
    partial = batch_df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(out) for out, c in sums.items()],
    )
    if os.path.exists(base_path):
        prev = spark.read.parquet(base_path)
        partial = prev.unionByName(partial).groupBy(*key_cols).agg(
            F.sum("n").alias("n"),
            *[F.sum(out).alias(out) for out in sums],
        )
    tmp = f"{base_path}.tmp"
    partial.write.mode("overwrite").parquet(tmp)
    old = f"{base_path}.old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(base_path):
        os.rename(base_path, old)
    os.rename(tmp, base_path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(base_path)


class WatermarkStore:
    """Durable high-watermark for scheduled incremental runs.

    The reference re-reads a fixed 2-day window on a daily cron — correct
    only while cadence < window. A persisted watermark removes that
    coupling: each run processes ``ts > stored - overlap`` and then
    advances the mark to the data's max, so missed runs catch up
    automatically and the overlap only covers genuinely late data.
    Writes are atomic (tmp + rename); in production the same two methods
    back onto an object store / metastore table.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def read(self) -> int | None:
        import json
        import os

        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)["watermark"]

    def write(self, watermark: int) -> None:
        import json
        import os

        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": int(watermark)}, f)
        os.replace(tmp, self.path)


def incremental_run(
    df: DataFrame, ts_col: str, store: WatermarkStore, overlap_days: int = 2
):
    """One scheduled incremental pass: rows after (watermark - overlap).
    First run = full load.

    Returns ``(batch_df, commit)``. The durable watermark is NOT advanced
    here — write ``batch_df`` to the sink first, then call ``commit()``.
    Advancing only after the sink succeeds keeps the at-least-once
    contract: a failed sink means the next run re-reads the whole failed
    batch, not just the overlap window. Combine with ``upsert_dedup`` +
    an upsert sink so redelivered rows are idempotent (T2).
    """
    mark = store.read()
    if mark is not None:
        df = df.filter(F.col(ts_col) > F.lit(mark - overlap_days * US_PER_DAY))

    def commit() -> None:
        new_mark = df.agg(F.max(ts_col)).collect()[0][0]
        if new_mark is not None:
            store.write(max(new_mark, mark or new_mark))

    return df, commit
