"""Unit tests for batch-101: streaming exact statistics.

Each test runs REAL Structured Streaming (file source, availableNow,
memory sink) on a hand-built events table and checks the statistic
against the same closed forms as the batch-9x tests.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest


def _write_events(spark, path, rows):
    # the streaming file source stages {sf_dir}/events.parquet as a
    # single FILE (like the driver testdata), so write one via pyarrow
    # instead of a Spark directory table
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pq.write_table(pa.Table.from_pandas(df), f"{path}/events.parquet")


def _ev(eid, etype, value):
    return (
        eid,
        dt.datetime(2021, 3, 1, 0, eid % 60, eid % 60),
        eid,
        etype,
        float(value),
        "{}",
    )


def test_stream_moments_textbook(spark, tmp_path):
    """click values [2,4,4,4,5,5,7,9] centis: g1 = 5.25/8,
    g2 = 44.5/16 - 3 (the batch-99 sample, now via streaming state)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline101 import (
        q_stream_moments_by_type,
    )

    rows = [
        _ev(i, "click", c / 100.0)
        for i, c in enumerate([2, 4, 4, 4, 5, 5, 7, 9], start=1)
    ]
    _write_events(spark, tmp_path, rows)
    got = q_stream_moments_by_type(spark, str(tmp_path)).collect()
    assert len(got) == 1
    row = got[0]
    assert row["event_type"] == "click" and row["n"] == 8
    assert row["skewness"] == pytest.approx(5.25 / 8, abs=1e-6)
    assert row["excess_kurtosis"] == pytest.approx(44.5 / 16 - 3, abs=1e-6)


def test_stream_kappa_hand_cells(spark, tmp_path):
    """a=20 b=5 c=10 d=15 -> kappa = 0.4 (batch-98 numbers)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline101 import (
        q_stream_kappa_2x2,
    )

    rows, eid = [], 0
    for etype, val, cnt in [
        ("click", 60.0, 20),
        ("purchase", 10.0, 5),
        ("view", 60.0, 10),
        ("view", 10.0, 15),
    ]:
        for _ in range(cnt):
            eid += 1
            rows.append(_ev(eid, etype, val))
    _write_events(spark, tmp_path, rows)
    got = q_stream_kappa_2x2(spark, str(tmp_path)).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (20, 5, 10, 15)
    assert got["kappa"] == pytest.approx(0.4, abs=1e-9)


def test_stream_cochran_hand_computed(spark, tmp_path):
    """Buckets 1,2,3 with (n,r) = (10,1),(10,5),(10,9): t_num = 240,
    z = 240/sqrt(4500) (batch-97 numbers)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline101 import (
        q_stream_cochran_trend,
    )

    rows, eid = [], 0
    for val, pos in [(50.0, 1), (150.0, 5), (250.0, 9)]:
        for i in range(10):
            eid += 1
            rows.append(_ev(eid, "purchase" if i < pos else "view", val))
    _write_events(spark, tmp_path, rows)
    got = q_stream_cochran_trend(spark, str(tmp_path)).collect()[0]
    assert got["n"] == 30 and got["positives"] == 15
    assert got["t_num"] == 240
    assert got["z"] == pytest.approx(240 / math.sqrt(4500), abs=1e-6)


def test_stream_pbiserial_closed_form(spark, tmp_path):
    """click x=[2,3,4] centis, view x=[1,2,3]: r = 9/(3*sqrt(33))."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline101 import (
        q_stream_pbiserial,
    )

    rows, eid = [], 0
    for c in [2, 3, 4]:
        eid += 1
        rows.append(_ev(eid, "click", c / 100.0))
    for c in [1, 2, 3]:
        eid += 1
        rows.append(_ev(eid, "view", c / 100.0))
    _write_events(spark, tmp_path, rows)
    got = q_stream_pbiserial(spark, str(tmp_path)).collect()[0]
    assert got["n1"] == 3 and got["n0"] == 3
    assert got["r_pb"] == pytest.approx(9 / (3 * math.sqrt(33)), abs=1e-6)
