"""Pipeline batch 58: graph partition quality + deterministic mode —

- ``community_quality``: modularity contribution and conductance of
  each community of a node partition — here the region partition of
  the undirected nation trade graph. The per-community report a
  community-detection run is judged by: e_in/m - (vol/2m)^2 and
  cut/min(vol, 2m-vol). All aggregations are integer counts; floats
  appear only in the final single-row-per-community arithmetic (same
  exact ints in, identical IEEE ops, one 6-dp round out).
- ``mode_per_key``: the most frequent event_type per user with a
  deterministic tie-break (higher count first, then lexicographic
  smallest value) — the reproducible replacement for Spark's
  tie-arbitrary ``mode()`` aggregate.

Scale notes: the trade-graph mining is the corpus-sized part (one
distinct over joined fact tables); the quality metrics then run on the
aggregated graph. mode_per_key is two keyed aggregations (count, then
per-key argmax window over the per-key value set — value-cardinality
sized, not event-sized).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# undirected, self-loop-free nation trade graph with region communities
_GRAPH_CTE = """
raw AS MATERIALIZED (
    SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS a,
                    greatest(s.s_nationkey, c.c_nationkey) AS b
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey <> c.c_nationkey
),
comm AS (
    SELECT n.n_nationkey AS node, r.r_name AS community
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
),
m AS (SELECT COUNT(*) AS m FROM raw),
tagged AS MATERIALIZED (
    SELECT e.a, e.b, ca.community AS ca, cb.community AS cb
    FROM raw e
    JOIN comm ca ON ca.node = e.a
    JOIN comm cb ON cb.node = e.b
)
"""

COMMUNITY_SQL = f"""
WITH {_GRAPH_CTE},
e_in AS (
    SELECT ca AS community, COUNT(*) AS e_in
    FROM tagged WHERE ca = cb GROUP BY ca
),
cut AS (
    SELECT community, SUM(c) AS cut FROM (
        SELECT ca AS community, COUNT(*) AS c FROM tagged WHERE ca <> cb GROUP BY ca
        UNION ALL
        SELECT cb AS community, COUNT(*) AS c FROM tagged WHERE ca <> cb GROUP BY cb
    ) t GROUP BY community
),
deg AS (
    SELECT node, community, COUNT(*) AS d FROM (
        SELECT a AS node, ca AS community FROM tagged
        UNION ALL
        SELECT b AS node, cb AS community FROM tagged
    ) t GROUP BY node, community
),
vol AS (
    SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d) AS BIGINT) AS vol
    FROM deg GROUP BY community
)
SELECT v.community,
       v.n_nodes,
       CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
       CAST(COALESCE(c.cut, 0) AS BIGINT) AS cut,
       v.vol,
       round(COALESCE(e.e_in, 0) / CAST(m.m AS DOUBLE)
             - (v.vol / (2.0 * m.m)) * (v.vol / (2.0 * m.m)), 6)
           AS modularity_contrib,
       CASE WHEN least(v.vol, 2 * m.m - v.vol) > 0
            THEN round(COALESCE(c.cut, 0)
                       / CAST(least(v.vol, 2 * m.m - v.vol) AS DOUBLE), 6)
            ELSE 0.0 END AS conductance
FROM vol v
LEFT JOIN e_in e ON e.community = v.community
LEFT JOIN cut c ON c.community = v.community
CROSS JOIN m
"""


@register("community_quality", oracle=COMMUNITY_SQL, covers=["A2", "J1"])
def q_community_quality(spark, sf_dir):
    """Partition-quality report: per-region modularity contribution and
    conductance over the undirected nation trade graph. Counts stay
    integer until the final per-community arithmetic; the nation/region
    dims broadcast into the edge tagging."""
    from prosnet_prefect_pipelines_spark.model import load_tables

    t = load_tables(
        spark, sf_dir,
        ["lineitem", "orders", "customer", "supplier", "nation", "region"],
    )
    raw = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
    )
    comm = (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("node"), F.col("r_name").alias("community"))
    )
    tagged = (
        raw.join(
            F.broadcast(comm.select(F.col("node").alias("a"), F.col("community").alias("ca"))),
            "a",
        ).join(
            F.broadcast(comm.select(F.col("node").alias("b"), F.col("community").alias("cb"))),
            "b",
        )
    )
    m = tagged.agg(F.count(F.lit(1)).alias("m"))
    e_in = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    crossing = tagged.filter(F.col("ca") != F.col("cb"))
    cut = (
        crossing.select(F.col("ca").alias("community"))
        .union(crossing.select(F.col("cb").alias("community")))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    deg = (
        tagged.select(F.col("a").alias("node"), F.col("ca").alias("community"))
        .union(tagged.select(F.col("b").alias("node"), F.col("cb").alias("community")))
        .groupBy("node", "community")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    vol = deg.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("vol"),
    )
    denom = F.least(F.col("vol"), 2 * F.col("m") - F.col("vol"))
    return (
        vol.join(e_in, "community", "left")
        .join(cut, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("e_in"), F.lit(0)).cast("long").alias("e_in"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            "vol",
            F.round(
                F.coalesce(F.col("e_in"), F.lit(0)) / F.col("m").cast("double")
                - (F.col("vol") / (2.0 * F.col("m")))
                * (F.col("vol") / (2.0 * F.col("m"))),
                6,
            ).alias("modularity_contrib"),
            F.when(
                denom > 0,
                F.round(
                    F.coalesce(F.col("cut"), F.lit(0)) / denom.cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


MODE_SQL = """
WITH counts AS (
    SELECT user_id, event_type, COUNT(*) AS c
    FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_event_type, c AS n
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY c DESC, event_type) AS rn
    FROM counts
) t WHERE rn = 1
"""


@register("mode_per_key", oracle=MODE_SQL, covers=["A2", "O6"])
def q_mode_per_key(spark, sf_dir):
    """Deterministic per-key mode: most frequent event_type per user,
    ties broken lexicographically — the reproducible replacement for
    tie-arbitrary mode(). Count agg (map-side combinable) then a
    per-key argmax window over the per-key value set."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # asc_nulls_last pins the tie-break to DuckDB's default NULL order
    # (Spark's bare asc is NULLS FIRST) — a NULL event_type tying with a
    # non-null one would otherwise pick different winners per engine
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), F.col("c").alias("n"))
    )
