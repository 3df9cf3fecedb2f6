"""Event-time windows over integer-nanosecond timestamps.

Capability extension beyond the reference (which has no streaming —
SURVEY §2.10): tumbling / sliding / session windows over the ``events``
table, exact over epoch-nanos longs so results are engine-independent
(the driver's parquet carries TIMESTAMP(NANOS)).

The streaming twins (Structured Streaming with watermarks, see
tests/test_streaming.py) use the same window algebra via F.window /
F.session_window on microsecond timestamps.

Scale: tumbling/sliding are single-shuffle hash aggregations on
(window, keys); sessionization is a window-function pass partitioned by
key — both AQE-friendly; sliding multiplies rows by length/slide before
the shuffle (explode), identical to Spark's built-in window expansion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NS = 1_000_000_000


def tumble(ts_ns: Column, width_ns: int) -> Column:
    """Window start (epoch nanos) of the tumbling window containing ts."""
    return ts_ns - ts_ns % F.lit(width_ns)


def sliding_windows(df: DataFrame, ts_col: str, width_ns: int, slide_ns: int) -> DataFrame:
    """Explode each row into every sliding window containing it.

    Adds ``window_start`` (epoch nanos). Mirrors Spark's built-in
    ``F.window(ts, width, slide)`` expansion, over exact longs.
    """
    assert width_ns % slide_ns == 0, "width must be a multiple of slide"
    k = width_ns // slide_ns
    ts = F.col(ts_col)
    anchor = ts - ts % F.lit(slide_ns)
    starts = F.array(*[anchor - F.lit(i * slide_ns) for i in range(k)])
    return df.withColumn("window_start", F.explode(starts))


def sessionize(
    df: DataFrame, key_cols: list[str], ts_col: str, gap_ns: int
) -> DataFrame:
    """Batch sessionization: new session when the gap to the previous event
    of the same key exceeds ``gap_ns``. Adds ``session_start`` (epoch ns).

    Pattern: lag -> gap flag -> running sum as session id -> min ts.
    (Streaming twin: F.session_window with watermark.)
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    gap_flag = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > gap_ns, F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("_new_session", gap_flag)
    wsum = Window.partitionBy(*key_cols).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    df = df.withColumn("_session_id", F.sum("_new_session").over(wsum))
    wmin = Window.partitionBy(*key_cols, "_session_id")
    return df.withColumn("session_start", F.min(ts_col).over(wmin)).drop(
        "_new_session", "_session_id"
    )
