"""Unit tests for batch-14: temporal reachability (equivalence +
semantics), rolling RANGE window, attribution, l-diversity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_temporal_reachability_respects_time(spark):
    from prosnet_prefect_pipelines_spark.operators.graph import temporal_reachability

    # a -> b at t=5; b -> c at t=3 (fires BEFORE arrival at b): c unreachable
    # b -> d at t=9 (after arrival): reachable at 9
    edges = [("a", "b", 5), ("b", "c", 3), ("b", "d", 9)]
    df = spark.createDataFrame(edges, "src string, dst string, t long")
    got = {(r.node, r.arrival) for r in temporal_reachability(df, ["a"]).collect()}
    assert got == {("a", 0), ("b", 5), ("d", 9)}


def test_temporal_reachability_driver_vs_distributed(spark):
    from prosnet_prefect_pipelines_spark.operators.graph import temporal_reachability

    import random

    rnd = random.Random(5)
    edges = [
        (rnd.randrange(25), rnd.randrange(25), rnd.randrange(60)) for _ in range(200)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    a = {(r.node, r.arrival) for r in temporal_reachability(df, [0]).collect()}
    b = {(r.node, r.arrival)
         for r in temporal_reachability(df, [0], driver_threshold=0).collect()}
    assert a == b and (0, 0) in a


def test_rolling_range_window_handles_gaps(spark):
    from pyspark.sql.window import Window

    # days 1,2,10: the day-10 window must NOT include days 1-2
    df = spark.createDataFrame(
        [("t", 1, 4), ("t", 2, 6), ("t", 10, 8)], "k string, day long, n long"
    )
    w = Window.partitionBy("k").orderBy("day").rangeBetween(-6, 0)
    out = {r.day: r.s for r in df.select("day", F.sum("n").over(w).alias("s")).collect()}
    assert out == {1: 4, 2: 10, 10: 8}


def test_attribution_picks_latest_click_within_lookback(spark):
    rows = [
        (1, 7, "click", 100),
        (2, 7, "click", 500),
        (3, 7, "purchase", 600),
        (4, 7, "click", 700),      # after the purchase — ignored
        (5, 8, "purchase", 50),    # no prior click — unattributed
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, m long")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("m").alias("p_min"))
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("m").alias("c_min"))
    from pyspark.sql.window import Window

    j = p.join(c, "user_id").filter(
        (F.col("c_min") <= F.col("p_min"))
        & (F.col("c_min") >= F.col("p_min") - 7 * 24 * 60))
    w = Window.partitionBy("p_id").orderBy(F.col("c_min").desc(), F.col("c_id").desc())
    got = {(r.p_id, r.c_id) for r in
           j.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()}
    assert got == {(3, 2)}


def test_l_diversity_flags_homogeneous_groups(spark):
    rows = [("g1", s) for s in [1, 1, 1]] + [("g2", s) for s in [1, 2, 3, 4, 5]]
    df = spark.createDataFrame(rows, "qid string, sensitive long")
    out = {r.qid: (r.n_sensitive, r.under_l) for r in df.groupBy("qid").agg(
        F.countDistinct("sensitive").alias("n_sensitive"),
        F.when(F.countDistinct("sensitive") < 5, 1).otherwise(0).alias("under_l"),
    ).collect()}
    assert out == {"g1": (1, 1), "g2": (5, 0)}


def test_cusum_property_random_series(spark):
    """Hypothesis-style sweep: the reflection closed form equals the
    recursion on random integer series."""
    import random

    from prosnet_prefect_pipelines_spark.operators.aggregates import cusum_scaled

    rnd = random.Random(21)
    for trial in range(3):
        vals = [rnd.randrange(0, 50) for _ in range(rnd.randrange(2, 12))]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v long"
        )
        got = {r.bucket: (r.cusum_pos, r.cusum_neg)
               for r in cusum_scaled(df, "k", "t", "v").collect()}
        d, t = len(vals), sum(vals)
        sp = sn = 0
        for i, v in enumerate(vals):
            y = v * d - t
            sp, sn = max(0, sp + y), max(0, sn - y)
            assert got[i] == (sp, sn)
