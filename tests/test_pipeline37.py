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


def test_session_similarity_bitmask_matches_bruteforce(spark):
    """Pin the r11 bitmask first-witness rewrite to brute-force set
    Jaccard: per-user event-type 3-gram sets computed in Python, every
    overlapping pair scored exactly, top-3 per user by (ppm desc, other
    asc) — the full output must match tuple-for-tuple."""
    import itertools
    from collections import defaultdict

    import pandas as pd

    from prosnet_prefect_pipelines_spark.plans.q_pipeline37 import (
        _TOPK,
        q_session_similarity_topk,
    )

    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    shingles: dict[int, set] = {}
    for uid, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        s = {(ts[i], ts[i + 1], ts[i + 2]) for i in range(len(ts) - 2)}
        if s:
            shingles[uid] = s
    per = defaultdict(list)
    for u, v in itertools.combinations(sorted(shingles), 2):
        c = len(shingles[u] & shingles[v])
        if not c:
            continue
        ppm = c * 1_000_000 // len(shingles[u] | shingles[v])
        per[u].append((ppm, v))
        per[v].append((ppm, u))
    expected = set()
    for u, lst in per.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rn, (ppm, o) in enumerate(lst[:_TOPK], 1):
            expected.add((u, o, ppm, rn))
    got = {
        (r.user_id, r.other, r.jaccard_ppm, r.rn)
        for r in q_session_similarity_topk(spark, SF).collect()
    }
    assert got == expected


def test_session_similarity_mask_guard_raises(spark, tmp_path):
    """The 128-bit mask design bound must fail loudly: 6 distinct
    event types -> 216 possible 3-gram codes -> ValueError."""
    import pytest

    from prosnet_prefect_pipelines_spark.plans.q_pipeline37 import (
        q_session_similarity_topk,
    )

    rows = [(i % 7, i, i, f"T{i % 6}") for i in range(42)]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, event_type string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    with pytest.raises(ValueError, match="128-bit mask"):
        q_session_similarity_topk(spark, str(tmp_path))


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


def test_session_similarity_construction_job_free_after_memo(spark, monkeypatch):
    """Pin the r12 enum memo (VERDICT r11 issue 1): once the per-(app,
    sf_dir) event-type enum is cached, constructing the DataFrame must
    schedule NO corpus-scan job — the old code ran a full-column
    distinct().collect() scan of events on EVERY plan build. Same probe
    protocol as distrank's job-free construction test, with two
    documented exemptions: the parquet footer/schema job spark.read
    itself runs (1 task, every catalog query pays it), and the
    load-bearing localCheckpoint pins (eager=False on an AQE plan
    materializes the non-result stages — execution work the bench
    times, not construction), intercepted to identity here."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline37 import (
        q_session_similarity_topk,
    )

    q_session_similarity_topk(spark, SF)  # warms the enum memo
    sc = spark.sparkContext
    df_cls = type(spark.range(1))  # classic DataFrame overrides the base
    monkeypatch.setattr(df_cls, "localCheckpoint", lambda self, eager=True: self)
    group = "session-similarity-construction-probe"
    sc.setJobGroup(group, "construction must be scan-free")
    try:
        q_session_similarity_topk(spark, SF)
        ids = list(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    st = sc.statusTracker()
    for jid in ids:
        info = st.getJobInfo(jid)
        for sid in info.stageIds:
            si = st.getStageInfo(sid)
            assert si is None or (si.numTasks <= 1 and "parquet" in si.name), (
                f"construction scheduled a scan job: {si.name} "
                f"({si.numTasks} tasks) — the enum memo must keep plan "
                "builds free of the events distinct scan"
            )
    monkeypatch.undo()
    # and the query still executes correctly afterwards
    assert q_session_similarity_topk(spark, SF).count() > 0
