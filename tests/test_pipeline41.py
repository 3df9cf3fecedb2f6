"""Unit tests for batch-41: square counting, trimmed mean."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_square_count_matches_bruteforce(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _und_edges
    from prosnet_prefect_pipelines_spark.plans.q_pipeline41 import q_square_count

    edges = {(r.src, r.dst) for r in _und_edges(spark, SF).collect()}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    # brute force: count C4s as sum over unordered non-adjacent-or-
    # adjacent pairs of C(common,2), halved (each square has 2 diagonals)
    nodes = sorted(adj)
    total = 0
    pairs = 0
    max_cn = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            cn = len(adj[a] & adj[b])
            if cn:
                pairs += 1
                max_cn = max(max_cn, cn)
                total += cn * (cn - 1) // 2
    r = q_square_count(spark, SF).collect()[0]
    assert r.squares == total // 2
    assert r.connected_pairs == pairs
    assert r.max_common_neighbors == max_cn


def test_trimmed_mean_matches_python(spark):
    from collections import defaultdict

    from prosnet_prefect_pipelines_spark.plans.q_pipeline41 import q_trimmed_mean_exact

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append((round(r.value * 100), r.event_id))
    got = {r.event_type: r for r in q_trimmed_mean_exact(spark, SF).collect()}
    assert set(got) == set(per)
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        cut = n // 10
        mid = [c for c, _ in vals[cut : n - cut]]
        r = got[et]
        assert r.n_total == n and r.n_kept == len(mid)
        assert r.kept_cents == sum(mid)
        assert r.trimmed_mean_cents == sum(mid) // len(mid)
