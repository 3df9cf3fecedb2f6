"""Unit tests for batch-44: encoding advisor, LSH S-curve table."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_encoding_advisor_thresholds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline44 import (
        _COLS,
        q_encoding_advisor,
    )

    rows = {r.col: r for r in q_encoding_advisor(spark, SF).collect()}
    assert set(rows) == set(_COLS)
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    for r in rows.values():
        assert r.n_values == n
        assert 1 <= r.n_runs <= r.n_values
        assert 1 <= r.n_distinct <= r.n_values
        assert r.distinct_ppm == r.n_distinct * 1_000_000 // r.n_values
        assert r.avg_run_milli == r.n_values * 1000 // r.n_runs
        if r.n_values >= 4 * r.n_runs:
            assert r.encoding == "rle"
        elif 100 * r.n_distinct <= r.n_values:
            assert r.encoding == "dict"
        else:
            assert r.encoding == "plain"
    # the 3-value flag columns must qualify for dictionary at least
    assert rows["l_returnflag"].encoding in ("dict", "rle")
    assert rows["l_returnflag"].n_distinct <= 3


def test_scurve_matches_float_formula(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline44 import (
        _CONFIGS,
        q_lsh_scurve_table,
    )

    rows = q_lsh_scurve_table(spark, SF).collect()
    assert len(rows) == len(_CONFIGS) * 9
    for r in rows:
        j = r.jaccard_micro / 1_000_000
        p = 1 - (1 - j ** r.r) ** r.b
        # integer ppm must match the float formula to 1 ppm
        assert abs(r.p_candidate_ppm - round(p * 1_000_000)) <= 1
        assert 0 <= r.p_candidate_ppm <= 1_000_000
    # monotone in jaccard for each config
    by_cfg: dict[tuple, list] = {}
    for r in rows:
        by_cfg.setdefault((r.r, r.b), []).append(r)
    for rs in by_cfg.values():
        rs.sort(key=lambda r: r.jaccard_micro)
        ps = [r.p_candidate_ppm for r in rs]
        assert ps == sorted(ps)
    # at j=0.5 fewer rows-per-band means higher candidate probability
    at_half = {(r.r, r.b): r.p_candidate_ppm for r in rows if r.jaccard_micro == 500000}
    assert at_half[(2, 6)] > at_half[(3, 4)] > at_half[(4, 3)] > at_half[(6, 2)]
