"""Unit tests for batch-78: cross-engine function parity suites."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_null_ordering_heads(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline78 import (
        q_null_ordering_matrix,
    )

    out = {r.ordering: r.first_name for r in q_null_ordering_matrix(spark, SF).collect()}
    assert set(out) == {
        "asc_nulls_first", "asc_nulls_last", "desc_nulls_first", "desc_nulls_last",
    }
    # nations 0,7,14,21 have NULL keys: NATION_0 is the lexically-first
    assert out["asc_nulls_first"] == "NATION_0"
    # nulls-last ascending starts at key 1
    assert out["asc_nulls_last"] == "NATION_1"


def test_binary_roundtrip_identity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline78 import (
        q_binary_codec_roundtrip,
    )

    rows = q_binary_codec_roundtrip(spark, SF).collect()
    src = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    for r in rows:
        assert r.roundtrip == src[r.n_nationkey]
        assert r.n_bytes == len(src[r.n_nationkey].encode())
        assert len(r.hex_str) == 2 * r.n_bytes


def test_timezone_dst_offsets(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline78 import (
        q_timezone_conversion_matrix,
    )

    out = {r.label: r for r in q_timezone_conversion_matrix(spark, SF).collect()}
    # January: New York is UTC-5
    assert out["2024-01-15 12:00:00"].new_york == "2024-01-15 07:00:00"
    # July: UTC-4 (DST)
    assert out["2024-07-04 00:00:00"].new_york == "2024-07-03 20:00:00"
    # Tokyo has no DST: always UTC+9
    assert out["2024-01-15 12:00:00"].tokyo == "2024-01-15 21:00:00"
    assert out["2024-07-04 00:00:00"].tokyo == "2024-07-04 09:00:00"


def test_string_matrix_spotchecks(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline78 import (
        q_string_func_matrix,
    )

    rows = {r.up: r for r in q_string_func_matrix(spark, SF).collect()}
    g = rows["NATION_3"]
    assert g.rev == "3_NOITAN"
    assert g.lpadded == "....NATION_3" and len(g.rpadded) == 12
    assert g.transl == "N4T10N_3"
    assert g.lev > 0  # no nation is literally GERMANY in this corpus


def test_date_matrix_month_end_clamp(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline78 import (
        q_date_func_matrix,
    )

    rows = {r.d: r for r in q_date_func_matrix(spark, SF).collect()}
    for d, r in rows.items():
        y, m, _ = map(int, d.split("-"))
        # month_end stays within the same month
        assert r.month_end[:7] == d[:7]
        assert 1 <= r.q <= 4
