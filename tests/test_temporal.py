"""Edge cases for as-of / range joins the oracle data can't exercise:
inclusive-equality matches, unmatched left rows, interval boundaries,
bucket-straddling intervals."""

from __future__ import annotations

from prosnet_prefect_pipelines_spark.operators.temporal import as_of_join, range_join


def test_asof_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [("u", 10, "p1"), ("u", 4, "p2"), ("v", 7, "p3")],
        "k string, ts long, lid string",
    )
    right = spark.createDataFrame(
        [("u", 10, "r_eq"), ("u", 5, "r_5"), ("w", 1, "r_other")],
        "k string, ts long, rid string",
    )
    got = {
        r.lid: (r.asof_ts, r.asof_rid)
        for r in as_of_join(left, right, ["k"], "ts", "ts", ["rid"]).collect()
    }
    assert got["p1"] == (10, "r_eq")       # equal ts matches (inclusive)
    assert got["p2"] == (None, None)       # no right row at-or-before 4
    assert got["p3"] == (None, None)       # key with no right rows at all
    assert len(got) == 3                   # left join: every left row kept


def test_asof_picks_latest_not_any(spark):
    left = spark.createDataFrame([("u", 100, "l")], "k string, ts long, lid string")
    right = spark.createDataFrame(
        [("u", t, f"r{t}") for t in (1, 50, 99, 101)],
        "k string, ts long, rid string",
    )
    row = as_of_join(left, right, ["k"], "ts", "ts", ["rid"]).collect()[0]
    assert (row.asof_ts, row.asof_rid) == (99, "r99")


def test_range_join_boundaries_and_straddle(spark):
    points = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 20), (4, 21), (5, 1000)], "pid long, x long"
    )
    # interval [10, 20] straddles buckets at width 7; bounds are inclusive
    iv = spark.createDataFrame([(10, 20, "a"), (0, 0, "b")], "lo long, hi long, ivid string")
    got = {
        (r.pid, r.ivid)
        for r in range_join(points, iv, "x", "lo", "hi", bucket_width=7).collect()
    }
    assert got == {(2, "a"), (3, "a"), (1, "b")}


def test_range_join_width_independence(spark):
    import random

    rng = random.Random(3)
    points = spark.createDataFrame(
        [(i, rng.randrange(0, 500)) for i in range(60)], "pid long, x long"
    )
    ivs = []
    for i in range(30):
        lo = rng.randrange(0, 480)
        ivs.append((i, lo, lo + rng.randrange(0, 60)))
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")
    results = [
        {(r.pid, r.ivid) for r in range_join(points, iv, "x", "lo", "hi", w).collect()}
        for w in (3, 50, 1000)
    ]
    assert results[0] == results[1] == results[2]


def test_asof_property_vs_bruteforce(spark):
    """Random keys/timestamps incl. duplicates: the windowed as-of equals
    the brute-force 'latest right at-or-before' reference."""
    import random

    rng = random.Random(17)
    left = [(f"k{rng.randrange(6)}", rng.randrange(50), i) for i in range(120)]
    right = [(f"k{rng.randrange(6)}", rng.randrange(50), 1000 + i) for i in range(80)]
    ldf = spark.createDataFrame(left, "k string, ts long, lid long")
    rdf = spark.createDataFrame(right, "k string, ts long, rid long")

    got = {
        r.lid: (r.asof_ts, r.asof_rid)
        for r in as_of_join(ldf, rdf, ["k"], "ts", "ts", ["rid"]).collect()
    }

    for k, lts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == k and rts <= lts]
        expected = max(cands) if cands else (None, None)
        assert got[lid] == expected, (k, lts, lid, got[lid], expected)


def test_funnel_stage_counts_monotone(spark, sf_dir):
    from prosnet_prefect_pipelines_spark.plans.q_temporal import q_funnel_conversion

    rows = {r.stage: r.n_users for r in q_funnel_conversion(spark, sf_dir).collect()}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"] >= 0


def test_scd2_intervals_partition_time(spark, sf_dir):
    from prosnet_prefect_pipelines_spark.plans.q_temporal import q_scd2_user_state

    rows = q_scd2_user_state(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in list(by_user.items())[:50]:
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, at the tail
        assert sum(r.is_current for r in ivs) == 1 and ivs[-1].is_current == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # contiguous, half-open
