"""Unit tests for batch-43: MinHash recall report, domain blocklist."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_minhash_recall_consistent(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline43 import (
        q_minhash_recall_report,
    )

    r = q_minhash_recall_report(spark, SF).collect()[0]
    assert r.truth_pairs > 0
    # verified LSH pairs are a subset of exact >=0.5 pairs
    assert 0 <= r.found_pairs <= r.truth_pairs
    assert r.missed_pairs == r.truth_pairs - r.found_pairs
    assert r.recall_ppm == r.found_pairs * 1_000_000 // r.truth_pairs
    # banding at 12 hashes / 4 bands should catch most near-exact dups
    assert r.recall_ppm >= 500_000


def test_blocklist_subdomain_semantics(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline43 import (
        _BLOCKLIST,
        q_domain_blocklist_filter,
    )

    rows = q_domain_blocklist_filter(spark, SF).collect()
    assert rows
    blocked = [r for r in rows if r.blocked]
    assert blocked  # the synthetic corpus hits several listed domains
    for r in rows:
        want = sorted(
            d for d in _BLOCKLIST if r.host == d or r.host.endswith("." + d)
        )
        if want:
            assert r.blocked and r.matched_domain == want[0]
        else:
            assert not r.blocked and r.matched_domain is None
        if r.host == "":  # the non-URL branch
            assert not r.blocked


def test_blocklist_tiers_agree(spark):
    """The broadcast-NLJ tier and the reversed-prefix equi-join tier
    must produce identical rows (same semantics, different plan)."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline43 import (
        q_domain_blocklist_filter,
        q_domain_blocklist_prefix_join,
    )

    a = {
        (r.doc_id, r.host, r.blocked, r.matched_domain)
        for r in q_domain_blocklist_filter(spark, SF).collect()
    }
    b = {
        (r.doc_id, r.host, r.blocked, r.matched_domain)
        for r in q_domain_blocklist_prefix_join(spark, SF).collect()
    }
    assert a == b
