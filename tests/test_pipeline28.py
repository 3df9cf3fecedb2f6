"""Unit tests for batch-28: LPA communities, truncated harmonic
centrality, common-neighbour link-prediction scores."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _graph(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _und_edges

    und = _und_edges(spark, SF)
    edges = {(r.src, r.dst) for r in und.collect()}
    nodes = {a for a, _ in edges}
    return edges, nodes


def test_lpa_labels_are_nodes_and_deterministic(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import q_lpa_communities

    _, nodes = _graph(spark)
    out1 = {r.node: r.label for r in q_lpa_communities(spark, SF).collect()}
    out2 = {r.node: r.label for r in q_lpa_communities(spark, SF).collect()}
    assert out1 == out2  # synchronous rounds + min tie-break => deterministic
    assert set(out1) == nodes
    assert set(out1.values()) <= nodes
    # propagation coarsens: strictly fewer labels than nodes on a
    # connected-ish graph
    assert len(set(out1.values())) < len(nodes)


def test_harmonic_2hop_matches_bfs(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import q_harmonic_2hop

    edges, nodes = _graph(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    rows = {r.node: r for r in q_harmonic_2hop(spark, SF).collect()}
    assert set(rows) == nodes
    for v in nodes:
        n1 = adj[v]
        n2 = {w for u in n1 for w in adj[u]} - n1 - {v}
        r = rows[v]
        assert r.n1 == len(n1) and r.n2 == len(n2)
        assert r.harmonic_micro == len(n1) * 1_000_000 + len(n2) * 500_000


def test_link_scores_candidates_are_nonedges(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import (
        q_link_scores_common_neighbors,
    )

    edges, _ = _graph(spark)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    rows = q_link_scores_common_neighbors(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a < r.b
        assert (r.a, r.b) not in edges
        common = adj[r.a] & adj[r.b]
        assert r.cn == len(common) >= 1
        assert 0 < r.jaccard_micro <= 1_000_000
        expected_ra = sum(1_000_000 // len(adj[w]) for w in common)
        assert r.ra_micro == expected_ra
