"""Unit tests for batch-75: merchandising analytics + ROC."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_abc_partition_and_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline75 import (
        q_abc_xyz_classification,
    )

    rows = sorted(
        q_abc_xyz_classification(spark, SF).collect(),
        key=lambda r: r.cum_share_ppm,
    )
    assert rows
    # cumulative share monotone to ~1e6; classes consistent with share
    assert rows[-1].cum_share_ppm >= 999_990
    for r in rows:
        expect = "A" if r.cum_share_ppm <= 800_000 else ("B" if r.cum_share_ppm <= 950_000 else "C")
        assert r.abc_class == expect
        assert r.xyz_class in ("X", "Y", "Z")
        assert r.dispersion_ppm >= 0


def test_roc_monotone_in_threshold(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline75 import (
        q_roc_points_fixed,
    )

    rows = sorted(q_roc_points_fixed(spark, SF).collect(), key=lambda r: r.thr)
    n_total = {r.tp + r.fp + r.fn + r.tn for r in rows}
    assert len(n_total) == 1  # every threshold partitions the same docs
    for a, b in zip(rows, rows[1:]):
        assert b.tp <= a.tp and b.fp <= a.fp  # higher threshold -> fewer positives
    for r in rows:
        assert r.tpr_ppm == r.tp * 1_000_000 // max(1, r.tp + r.fn)
        assert r.fpr_ppm == r.fp * 1_000_000 // max(1, r.fp + r.tn)


def test_demand_curve_partitions_rows(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline75 import (
        q_demand_curve_report,
    )

    rows = q_demand_curve_report(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == li


def test_return_rates_bounded(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline75 import (
        q_return_rate_by_brand,
    )

    rows = q_return_rate_by_brand(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert r.return_ppm == r.n_returned * 1_000_000 // r.n_lines


def test_discount_budget_identity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline75 import (
        q_discount_effect_report,
    )

    rows = q_discount_effect_report(spark, SF).collect()
    assert rows
    zero = [r for r in rows if r.disc_pct == 0]
    if zero:
        assert zero[0].discount_given_cents == 0
    for r in rows:
        assert r.mean_qty_micro >= 1_000_000  # quantities >= 1
