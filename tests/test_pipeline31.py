"""Unit tests for batch-31: group-aware leakage-proof splits."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_group_split_clusters_never_leak(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline31 import (
        q_group_split_no_leakage,
    )

    rows = q_group_split_no_leakage(spark, SF).collect()
    assert rows
    by_cluster: dict[int, set] = {}
    naive_by_cluster: dict[int, set] = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        by_cluster.setdefault(r.cluster_rep, set()).add(r.split)
        naive_by_cluster.setdefault(r.cluster_rep, set()).add(r.naive_split)
    # the invariant: a cluster occupies exactly ONE split under the
    # group assignment
    assert all(len(s) == 1 for s in by_cluster.values())
    # the augmented corpus has multi-doc clusters, and the naive split
    # demonstrably scatters at least one of them
    multi = [c for c, s in naive_by_cluster.items() if len(s) > 1]
    assert multi, "expected at least one naive leak in the augmented corpus"


def test_leakage_audit_consistent_with_split(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline31 import (
        q_split_leakage_audit,
    )

    rows = q_split_leakage_audit(spark, SF).collect()
    assert rows  # augmentation guarantees multi-doc clusters at any sf
    for r in rows:
        assert r.n_docs > 1
        assert r.group_splits == 1  # the guard, verified per cluster
        assert 1 <= r.naive_splits <= 3
        assert r.naive_leaks == (r.naive_splits > 1)
