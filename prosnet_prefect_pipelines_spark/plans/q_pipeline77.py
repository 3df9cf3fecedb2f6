"""Pipeline batch 77 (north-star extension): interval analytics & BI
presentation — sweep-line session concurrency, overlapping-interval
merging, top-N-plus-other rollups, equi-depth histogram boundaries, and
the native SQL PIVOT surface.

Exactness discipline: intervals are exact integer microseconds built
from 30-minute-gap sessionization; concurrency is a +1/-1 boundary
sweep (running sum); utilization is truncating ppm."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.operators.distrank import (
    prefix_sums,
)
from prosnet_prefect_pipelines_spark.plans.catalog import register

_GAP_US = 1_800_000_000  # 30 min

# shared session CTE: per-user sessions from 30-min gaps
SESSIONS_CTE = f"""
ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
    WHERE user_id IS NOT NULL
),
marked AS (
    SELECT user_id, ts_us,
           CASE WHEN ts_us - lag(ts_us) OVER w > {_GAP_US}
                     OR lag(ts_us) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
numbered AS (
    SELECT user_id, ts_us,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
sessions AS (
    SELECT user_id, sid, MIN(ts_us) AS s, MAX(ts_us) AS e
    FROM numbered GROUP BY user_id, sid
)
"""


def _sessions(spark, sf_dir):
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = marked.withColumn("sid", F.sum("new_session").over(wn))
    return numbered.groupBy("user_id", "sid").agg(
        F.min("ts_us").alias("s"), F.max("ts_us").alias("e")
    )


# ---------------------------------------------------------------------------
# sweep-line concurrency profile.

CONCURRENCY_SQL = f"""
WITH {SESSIONS_CTE},
bounds AS (
    SELECT s AS t, 1 AS delta FROM sessions
    UNION ALL
    SELECT e + 1 AS t, -1 AS delta FROM sessions
),
agg AS (SELECT t, SUM(delta) AS d FROM bounds GROUP BY t),
sweep AS (
    SELECT t, SUM(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
    FROM agg
)
SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(COUNT(*) AS BIGINT) AS n_change_points,
       CAST(SUM(CASE WHEN conc >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_points_at_5plus
FROM sweep
"""


@register("concurrent_sessions_profile", oracle=CONCURRENCY_SQL, covers=["A2", "O1"])
def q_concurrent_sessions_profile(spark, sf_dir):
    """Session concurrency via sweep line: every session contributes a
    +1 at its start and a -1 after its end; the running sum over the
    deduplicated boundary timeline IS the live-session count at every
    change point — peak concurrency with no interval self-join. The
    sweep (r11) runs through the distributed two-pass prefix sum —
    exactly the 'shard by time range with per-shard offsets' escalation
    this docstring used to promise, now the actual plan (the boundary
    timeline grows with the corpus; a single-partition window over it
    was the latent cliff)."""
    sess = _sessions(spark, sf_dir)
    bounds = sess.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    agg = bounds.groupBy("t").agg(F.sum("delta").alias("d"))
    cum = prefix_sums(
        agg, [F.col("t").asc()], {"conc": F.col("d")}
    )
    sweep = cum.select("conc")
    return sweep.agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
        F.sum(F.when(F.col("conc") >= 5, 1).otherwise(0))
        .cast("long")
        .alias("n_points_at_5plus"),
    )


# ---------------------------------------------------------------------------
# merge overlapping intervals into episodes (interval union).

MERGE_SQL = f"""
WITH {SESSIONS_CTE},
ordered AS (
    SELECT user_id, s, e,
           MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS max_e_before
    FROM sessions
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN max_e_before IS NULL OR s > max_e_before THEN 1 ELSE 0 END
               AS new_episode
    FROM ordered
),
episodes AS (
    SELECT user_id, s, e,
           SUM(new_episode) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS UNBOUNDED PRECEDING) AS eid
    FROM flagged
),
merged AS (
    SELECT user_id, eid, MIN(s) AS s, MAX(e) AS e
    FROM episodes GROUP BY user_id, eid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_episodes,
       CAST(SUM(e - s) AS BIGINT) AS busy_us,
       CAST(MAX(e) - MIN(s) AS BIGINT) AS span_us,
       CAST(CASE WHEN MAX(e) > MIN(s)
                 THEN CAST(SUM(e - s) AS HUGEINT) * 1000000 // (MAX(e) - MIN(s))
                 ELSE 1000000 END AS BIGINT) AS utilization_ppm
FROM merged GROUP BY user_id
"""


@register("merge_overlapping_intervals", oracle=MERGE_SQL, covers=["A2", "O1"])
def q_merge_overlapping_intervals(spark, sf_dir):
    """Interval union (gaps-and-islands over intervals): per-user
    sessions merged into maximal non-overlapping episodes — an interval
    starts a new episode iff it begins after the running max end of
    everything before it. Episode count, exact busy time, span, and
    utilization ppm per user; all windows partition by user."""
    sess = _sessions(spark, sf_dir)
    wo = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = sess.withColumn("max_e_before", F.max("e").over(wo)).withColumn(
        "new_episode",
        F.when(
            F.col("max_e_before").isNull() | (F.col("s") > F.col("max_e_before")),
            1,
        ).otherwise(0),
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    episodes = flagged.withColumn("eid", F.sum("new_episode").over(wn))
    merged = episodes.groupBy("user_id", "eid").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_episodes"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("busy_us"),
        (F.max("e") - F.min("s")).cast("long").alias("span_us"),
        F.expr(
            "CAST(CASE WHEN MAX(e) > MIN(s) THEN "
            "CAST(SUM(e - s) AS DECIMAL(38,0)) * 1000000 div (MAX(e) - MIN(s)) "
            "ELSE 1000000 END AS BIGINT)"
        ).alias("utilization_ppm"),
    )


# ---------------------------------------------------------------------------
# top-N plus 'other' rollup.

TOPN_OTHER_SQL = """
WITH rev AS (
    SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY nation, cust
),
ranked AS (
    SELECT nation, cust, cents,
           row_number() OVER (PARTITION BY nation
                              ORDER BY cents DESC, cust) AS rnk
    FROM rev
)
SELECT CAST(nation AS BIGINT) AS nation,
       CASE WHEN rnk <= 3 THEN CAST(cust AS VARCHAR) ELSE '__other__' END
           AS bucket,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM ranked GROUP BY nation, bucket
"""


@register("topn_plus_other", oracle=TOPN_OTHER_SQL, covers=["A2", "O6"])
def q_topn_plus_other(spark, sf_dir):
    """Top-N-plus-other: each nation's top-3 customers by exact revenue
    stay named; everyone else folds into one '__other__' row — the
    presentation rollup behind every pie/bar chart with a tail. The
    rank window partitions by nation over the bounded per-nation
    customer set."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nation")
    )
    rev = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", F.col("o_custkey").alias("cust"))
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("cents").desc(), F.col("cust"))
    ranked = rev.withColumn("rnk", F.row_number().over(w))
    return ranked.select(
        F.col("nation").cast("long").alias("nation"),
        F.when(F.col("rnk") <= 3, F.col("cust").cast("string"))
        .otherwise("__other__")
        .alias("bucket"),
        "cents",
    ).groupBy("nation", "bucket").agg(
        F.sum("cents").cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# equi-depth histogram boundaries (optimizer-statistics style).

EQUIDEPTH_SQL = """
WITH pts AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
),
b AS (
    SELECT cents, ntile(10) OVER (ORDER BY cents) AS bucket FROM pts
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents
FROM b GROUP BY bucket
"""


@register("equi_depth_histogram", oracle=EQUIDEPTH_SQL, covers=["A2", "O1"])
def q_equi_depth_histogram(spark, sf_dir):
    """Equi-depth histogram: 10 equal-count buckets over price cents
    with their exact boundaries — the ANALYZE-statistics structure an
    optimizer estimates selectivity from. ntile's total order makes the
    boundaries deterministic (cents ties share a value across the
    cut, both engines split identically by row position over the
    sorted run). At 100 TB this is built from a deterministic sample,
    not the full sort — documented trade; the full-sort form here is
    the exactness oracle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    # |V|-bound convention (r5 verdict item 4): the original ntile
    # window sorted ALL rows on one partition. ntile's output is fully
    # determined by per-distinct-value counts: bucket i (1-based, base
    # = N div 10, rem = N mod 10) spans row positions
    # [(i-1)*base + min(i-1, rem) + 1, i*base + min(i, rem)], and a
    # value v (occupying cumulative positions [tot(v)-cnt(v)+1,
    # tot(v)]) contributes to every bucket its range intersects — so
    # lo/hi per bucket are min/max v over the intersecting values.
    # The cumulative window runs over |V| distinct prices; the
    # 10-row bucket-bounds table broadcasts into a range join.
    per_v = pts.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    # r11: |V| distinct prices is value-cardinality — cumulate via the
    # distributed two-pass prefix sum instead of one partition
    cum = prefix_sums(
        per_v, [F.col("cents").asc()], {"hi_pos": F.col("cnt")}
    )
    vals = cum.select(
        "cents",
        (F.col("hi_pos") - F.col("cnt") + 1).alias("lo_pos"),
        "hi_pos",
    )
    n_tot = per_v.agg(F.sum("cnt").alias("N"))
    buckets = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(F.broadcast(n_tot))
        .select(
            "bucket",
            (
                (F.col("bucket") - 1) * F.expr("N div 10")
                + F.least(F.col("bucket") - 1, F.col("N") % 10)
                + 1
            ).alias("b_lo"),
            (
                F.col("bucket") * F.expr("N div 10")
                + F.least(F.col("bucket").cast("long"), F.col("N") % 10)
            ).alias("b_hi"),
        )
    )
    joined = vals.join(
        F.broadcast(buckets),
        (F.col("lo_pos") <= F.col("b_hi")) & (F.col("hi_pos") >= F.col("b_lo")),
    )
    return joined.groupBy("bucket").agg(
        (F.first("b_hi") - F.first("b_lo") + 1).cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
    ).select(F.col("bucket").cast("int").alias("bucket"), "n", "lo_cents", "hi_cents")


# ---------------------------------------------------------------------------
# native SQL PIVOT surface.

PIVOT_SQL = """
WITH src AS (
    SELECT c.c_nationkey AS nation, o.o_orderpriority AS pri,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey < 5
)
SELECT nation,
       CAST(SUM(CASE WHEN pri = '1-URGENT' THEN cents ELSE 0 END) AS BIGINT)
           AS urgent_cents,
       CAST(SUM(CASE WHEN pri = '2-HIGH' THEN cents ELSE 0 END) AS BIGINT)
           AS high_cents,
       CAST(SUM(CASE WHEN pri = '3-MEDIUM' THEN cents ELSE 0 END) AS BIGINT)
           AS medium_cents
FROM src GROUP BY nation
"""


@register("sql_pivot_native", oracle=PIVOT_SQL, covers=["A2", "P1"])
def q_sql_pivot_native(spark, sf_dir):
    """The native SQL PIVOT clause (Spark >= 3.4 SQL surface): priority
    revenue pivoted to columns with an explicit IN list — compiled to
    the same single-scan conditional aggregation the oracle writes as
    CASE sums. Pivot values are pinned (no dynamic-column scan)."""
    for t in ("orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT nation, COALESCE(urgent_cents, 0) AS urgent_cents,
               COALESCE(high_cents, 0) AS high_cents,
               COALESCE(medium_cents, 0) AS medium_cents
        FROM (
            SELECT c.c_nationkey AS nation, o.o_orderpriority AS pri,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_nationkey < 5
        )
        PIVOT (
            SUM(cents)
            FOR pri IN ('1-URGENT' AS urgent_cents, '2-HIGH' AS high_cents,
                        '3-MEDIUM' AS medium_cents)
        )
        """
    )
