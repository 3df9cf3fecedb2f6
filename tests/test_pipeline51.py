"""Unit tests for batch-51: diversity, rich club, CDC dedup."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_diversity_closed_form(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline51 import q_type_diversity

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    per: dict[int, Counter] = {}
    for r in ev:
        per.setdefault(r.user_id, Counter())[r.event_type] += 1
    got = {r.user_id: r for r in q_type_diversity(spark, SF).collect()}
    assert set(got) == set(per)
    for user, counts in per.items():
        n = sum(counts.values())
        want = 1_000_000 - sum(c * c for c in counts.values()) * 1_000_000 // (n * n)
        r = got[user]
        assert r.n_events == n and r.n_types == len(counts)
        assert r.diversity_ppm == want
        assert 0 <= r.diversity_ppm < 1_000_000


def test_rich_club_bruteforce(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _und_edges
    from prosnet_prefect_pipelines_spark.plans.q_pipeline51 import _KS, q_rich_club

    edges = {(r.src, r.dst) for r in _und_edges(spark, SF).collect() if r.src < r.dst}
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r.k: r for r in q_rich_club(spark, SF).collect()}
    assert set(got) == set(_KS)
    for k in _KS:
        rich = {v for v, d in deg.items() if d > k}
        m = sum(1 for a, b in edges if a in rich and b in rich)
        r = got[k]
        assert r.n_rich == len(rich) and r.rich_edges == m
        if len(rich) >= 2:
            assert r.phi_ppm == m * 2 * 1_000_000 // (len(rich) * (len(rich) - 1))
        else:
            assert r.phi_ppm == 0


def test_cdc_dedup_sanity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline51 import q_cdc_chunk_dedup

    r = q_cdc_chunk_dedup(spark, SF).collect()[0]
    assert 0 < r.unique_chunks <= r.total_chunks
    assert r.dedup_ppm == (r.total_chunks - r.unique_chunks) * 1_000_000 // r.total_chunks
    # the duplicated-docs population guarantees shared chunks
    assert r.dedup_ppm > 0
    # token conservation
    import pyspark.sql.functions as F

    total_toks = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))))
        .collect()[0][0]
    )
    assert r.total_tokens == total_toks
