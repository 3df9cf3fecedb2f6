"""Unit tests for batch-37: RLS/masking view, session similarity."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_rls_view_rows_and_mask(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline37 import (
        _POLICY,
        _ROLE,
        q_rls_masked_view,
    )

    allowed = {s for r, s, _ in _POLICY if r == _ROLE}
    show_balance = {s: b for r, s, b in _POLICY if r == _ROLE}
    rows = q_rls_masked_view(spark, SF).collect()
    assert rows
    seen_segments = set()
    for r in rows:
        assert r.c_mktsegment in allowed  # row-level policy
        seen_segments.add(r.c_mktsegment)
        if show_balance[r.c_mktsegment]:
            assert r.acctbal_cents is not None
        else:
            assert r.acctbal_cents is None  # column mask
        assert r.role == _ROLE
    assert seen_segments == allowed
    # no row outside the policy leaked
    total_allowed = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(f"c_mktsegment IN ({','.join(repr(s) for s in allowed)})")
        .count()
    )
    assert len(rows) == total_allowed


def test_session_similarity_topk_sane(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline37 import (
        _TOPK,
        q_session_similarity_topk,
    )

    rows = q_session_similarity_topk(spark, SF).collect()
    assert rows
    per_user = Counter(r.user_id for r in rows)
    for r in rows:
        assert r.user_id != r.other
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert 1 <= r.rn <= _TOPK
    assert max(per_user.values()) <= _TOPK
    # ranks are dense per user and ordered by score
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.jaccard_ppm for r in rs]
        assert scores == sorted(scores, reverse=True)
