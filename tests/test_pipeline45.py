"""Unit tests for batch-45: embedding energy, hard negatives."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_energy_report_monotone_in_dim(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline45 import (
        _DIMS,
        q_embedding_energy_report,
    )

    rows = {r.prefix_dim: r for r in q_embedding_energy_report(spark, SF).collect()}
    assert set(rows) == set(_DIMS)
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    for r in rows.values():
        assert r.n_vecs == n
        assert 0 <= r.min_retained_ppm <= r.mean_retained_ppm <= 1_000_000
    # longer prefixes retain at least as much energy on average
    means = [rows[d].mean_retained_ppm for d in sorted(_DIMS)]
    assert means == sorted(means)


def test_hard_negatives_band_and_cells(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline45 import (
        q_hard_negative_mining,
    )

    rows = q_hard_negative_mining(spark, SF).collect()
    assert rows
    per_anchor = Counter(r.anchor for r in rows)
    for r in rows:
        assert r.anchor != r.negative
        assert 0.1 <= r.cos < 0.8  # the semi-hard band
        assert r.rn in (1, 2)
    assert max(per_anchor.values()) <= 2
    # hardness order within anchor
    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r.anchor, []).append(r)
    for rs in by_anchor.values():
        rs.sort(key=lambda r: r.rn)
        cs = [r.cos for r in rs]
        assert cs == sorted(cs, reverse=True)
