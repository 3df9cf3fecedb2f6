"""Custom stateful streaming operator: last-write-wins upsert state.

The reference's sink semantics are idempotent upsert-by-id
(prosnet-prefect-pipelines/push_to_typesense.py:49-51) over overlapping
incremental windows (T2, SURVEY §2.10). In a true streaming setting that
is per-key state: keep the winning (latest event-time, then highest id)
row per key across micro-batches, emit the winner whenever it changes.

Implemented with ``applyInPandasWithState`` — Arrow-batched per-group
Python with a state store — the designated Spark mechanism for operators
the built-in aggregations can't express. State is one small tuple per
key; partitioned by the group key, it scales with |keys|, not |events|.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_id long, event_type string, ts_us long"
STATE_SCHEMA = "ts_us long, event_id long, event_type string"


def _last_write_wins(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best: tuple[Any, ...] | None = state.get if state.exists else None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # winner = max (event-time, id) — deterministic under replay,
        # matching the batch upsert_dedup policy exactly. Vectorized:
        # idxmax over a composite sort key, not a per-row Python loop.
        i = pdf.sort_values(["ts_us", "event_id"]).index[-1]
        cand = (
            int(pdf.at[i, "ts_us"]),
            int(pdf.at[i, "event_id"]),
            str(pdf.at[i, "event_type"]),
        )
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [best[1]],
            "event_type": [best[2]],
            "ts_us": [best[0]],
        }
    )


def last_write_wins_state(events: DataFrame) -> DataFrame:
    """events (streaming, with user_id/event_id/event_type/ts_us) ->
    one current-winner row per user per micro-batch (update mode)."""
    return events.select("user_id", "event_id", "event_type", "ts_us").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _last_write_wins,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
