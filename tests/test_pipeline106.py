"""Unit tests for batch-106: streaming model & data monitoring.

Each test runs REAL Structured Streaming (file source, availableNow,
memory sink) on a hand-built single-file table and checks the
batch-side statistic against the batch-105 closed forms: the 4-line
scenario gives AUC 0.875, confusion (2,1,0,1), Brier 0.125; the PSI
test shifts a 50/50 reference to 75/25 for a closed-form index.
"""

from __future__ import annotations

import datetime as dt
import math


def _write_lineitem(spark, path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows, columns=["l_orderkey", "l_discount", "l_returnflag"]
    )
    pq.write_table(pa.Table.from_pandas(df), f"{path}/lineitem.parquet")


def _write_events(spark, path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pq.write_table(pa.Table.from_pandas(df), f"{path}/events.parquet")


_LINES = [
    (1, 0.10, "R"),  # s=10, y=1
    (2, 0.05, "R"),  # s=5,  y=1
    (3, 0.05, "N"),  # s=5,  y=0
    (4, 0.00, "N"),  # s=0,  y=0
]


def test_stream_auc_matches_rank_identity(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline106 import (
        q_stream_auc_cells,
    )

    _write_lineitem(spark, tmp_path, _LINES)
    r = q_stream_auc_cells(spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert abs(r.auc_6 - 0.875) <= 1e-9


def test_stream_confusion_cells_fold(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline106 import (
        q_stream_threshold_confusion,
    )

    _write_lineitem(spark, tmp_path, _LINES)
    r = q_stream_threshold_confusion(spark, str(tmp_path)).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 0, 1)
    assert abs(r.f1_6 - 0.8) <= 1e-9
    assert abs(r.mcc_6 - round(2 / math.sqrt(12), 6)) <= 1e-9


def test_stream_brier_and_skill(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline106 import (
        q_stream_brier_monitor,
    )

    _write_lineitem(spark, tmp_path, _LINES)
    r = q_stream_brier_monitor(spark, str(tmp_path)).collect()[0]
    assert r.n_lines == 4
    assert abs(r.brier_6 - 0.125) <= 1e-9
    assert abs(r.uncertainty_6 - 0.25) <= 1e-9
    assert abs(r.skill_vs_base_6 - (-0.125)) <= 1e-9


def test_stream_psi_closed_form(spark, tmp_path):
    """Reference 50/50 over buckets {0,1} shifts to 75/25:
    PSI = 0.25*ln(1.5) + (-0.25)*ln(0.5)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline106 import (
        q_stream_psi_buckets,
    )

    ref_ts = dt.datetime(2024, 1, 10)
    cur_ts = dt.datetime(2024, 1, 20)
    rows = [
        (1, ref_ts, 1, "view", 500.0, "{}"),    # ref bucket 0
        (2, ref_ts, 1, "view", 1500.0, "{}"),   # ref bucket 1
        (3, cur_ts, 1, "view", 500.0, "{}"),    # cur bucket 0
        (4, cur_ts, 1, "view", 500.0, "{}"),
        (5, cur_ts, 1, "view", 500.0, "{}"),
        (6, cur_ts, 1, "view", 1500.0, "{}"),   # cur bucket 1
    ]
    _write_events(spark, tmp_path, rows)
    r = q_stream_psi_buckets(spark, str(tmp_path)).collect()[0]
    assert (r.n_reference, r.n_current, r.n_buckets) == (2, 4, 2)
    t0 = round((0.75 - 0.5) * math.log(0.75 / 0.5), 9)
    t1 = round((0.25 - 0.5) * math.log(0.25 / 0.5), 9)
    assert abs(r.psi_6 - round(t0 + t1, 6)) <= 1e-9
