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
