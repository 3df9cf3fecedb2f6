"""Pipeline batch 28: the community/centrality/link-prediction tier the
graph suite was still missing —

- ``lpa_communities``: deterministic synchronous label propagation
  (2 rounds, majority label, ties to the smallest label) — the cheap
  community detector that complements exact components/SCC/k-core.
- ``harmonic_2hop``: truncated harmonic centrality (radius 2):
  n1 + n2/2 per node in exact micro units — the influence score used
  for graph-sampling curricula without a full APSP.
- ``link_scores_common_neighbors``: common-neighbour link-prediction
  scores for non-edges — Jaccard and Resource-Allocation (sum of
  1/deg(w) over shared neighbours w) in exact integer micro units.

Graph: the same sf-scaled two-moduli orders graph as
``triangle_count`` (q_pipeline2) — node count grows with the data so
average degree stays constant at any sf, keeping wedge counts linear.

Scale notes (100 TB):
- LPA shuffles once per round keyed by the destination node (group-by
  argmax via count + max(struct(cnt, -label)) — algebraic, map-side
  combined, no sorted window). Rounds are fixed (2), lineage stays flat.
- harmonic/link scores enumerate wedges (src,w,dst): cost is
  sum_w deg(w)^2, linear in edges at constant degree; hot hubs are the
  skew risk and AQE skew-join handles the wedge join's build side.
- every score is exact integer arithmetic (micro units, floor div), so
  the DuckDB twin hashes identically on any engine.

Reference context: the reference has no graph-analytics tier (rdflib
ETL only); these extend the engine per the build brief's
training-data-pipeline mandate (graph curricula / negative mining).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# sf-scaled undirected simple graph (canonical a < b), same construction
# as TRIANGLES_SQL in q_pipeline2
_GRAPH_SQL = """
m AS (
    SELECT COUNT(*) // 10 + 1 AS m1, COUNT(*) // 10 + 3 AS m2 FROM orders
),
raw AS (
    SELECT o_orderkey % m1 AS u, o_orderkey % m2 AS v FROM orders, m
),
e AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM raw WHERE u <> v
),
und AS (
    SELECT a AS src, b AS dst FROM e
    UNION ALL
    SELECT b AS src, a AS dst FROM e
)
"""


def _und_edges(spark, sf_dir):
    """Undirected edge list (both directions), deterministic and simple."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()  # parquet metadata count — no data scan
    m1, m2 = n // 10 + 1, n // 10 + 3
    k = F.col("o_orderkey")
    e = (
        orders.select(
            F.least(k % m1, k % m2).alias("a"), F.greatest(k % m1, k % m2).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


# --- label propagation communities --------------------------------------------------------

_LPA_ROUND_SQL = """
{out} AS (
    SELECT u.dst AS node,
           -- majority neighbour label, ties to the smallest label
           min(lbl) FILTER (WHERE cnt = mx) AS label
    FROM (
        SELECT c.dst, l.label AS lbl, COUNT(*) AS cnt,
               MAX(COUNT(*)) OVER (PARTITION BY c.dst) AS mx
        FROM und c JOIN {inp} l ON l.node = c.src
        GROUP BY c.dst, l.label
    ) u
    GROUP BY u.dst
)
"""

LPA_SQL = (
    "WITH "
    + _GRAPH_SQL.strip().rstrip()
    + """,
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
"""
    + _LPA_ROUND_SQL.format(inp="l0", out="l1")
    + ","
    + _LPA_ROUND_SQL.format(inp="l1", out="l2")
    + """
SELECT node, label FROM l2
"""
)


@register("lpa_communities", oracle=LPA_SQL, covers=["J1", "A2", "O6"])
def q_lpa_communities(spark, sf_dir):
    """Synchronous label propagation, 2 deterministic rounds: each node
    adopts the most frequent label among its neighbours, ties broken to
    the smallest label. Per round: one shuffle keyed by the receiving
    node — neighbour-label counts aggregate map-side, the argmax is
    min-label-where-count-equals-max computed inside the same
    aggregation (count window over the node partition, algebraic, no
    global sort). Fixed round count keeps lineage flat; at 100 TB each
    round is one co-partitioned join + one combine-heavy groupBy."""
    und = _und_edges(spark, sf_dir).localCheckpoint(eager=False)  # reused twice
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(2):
        counted = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst"), F.col("label").alias("lbl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("mx", F.max("cnt").over(Window.partitionBy("dst")))
        )
        labels = (
            counted.filter(F.col("cnt") == F.col("mx"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("label"))
        )
    return labels


# --- truncated harmonic centrality (radius 2) ---------------------------------------------

HARMONIC_SQL = (
    "WITH "
    + _GRAPH_SQL.strip()
    + """,
n1 AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY src),
two AS (
    SELECT DISTINCT e1.src AS node, e2.dst AS far
    FROM und e1 JOIN und e2 ON e1.dst = e2.src
    WHERE e2.dst <> e1.src
),
d2 AS (
    SELECT t.node, CAST(COUNT(*) AS BIGINT) AS n2
    FROM two t
    LEFT JOIN und d ON d.src = t.node AND d.dst = t.far
    WHERE d.src IS NULL
    GROUP BY t.node
)
SELECT n1.node, n1.deg AS n1,
       coalesce(d2.n2, 0) AS n2,
       n1.deg * 1000000 + coalesce(d2.n2, 0) * 500000 AS harmonic_micro
FROM n1 LEFT JOIN d2 ON d2.node = n1.node
"""
)


@register("harmonic_2hop", oracle=HARMONIC_SQL, covers=["J1", "A2"])
def q_harmonic_2hop(spark, sf_dir):
    """Radius-2 harmonic centrality: n1 + n2/2 in exact micro units,
    where n2 counts nodes at exactly distance 2 (2-hop reachable, not a
    neighbour, not self). Wedge enumeration joins on the middle node —
    cost sum deg(w)^2, linear at constant degree; the distance-2 set is
    de-duplicated before the neighbour anti-join so the anti-join input
    is bounded by distinct pairs, not wedges."""
    und = _und_edges(spark, sf_dir).localCheckpoint(eager=False)  # 3 self-joins
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    e1, e2 = und.alias("e1"), und.alias("e2")
    two = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .select(F.col("e1.src").alias("node"), F.col("e2.dst").alias("far"))
        .distinct()
    )
    d2 = (
        two.join(
            und,
            (two.node == und.src) & (two.far == und.dst),
            "left_anti",
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    return deg.join(d2, "node", "left").select(
        "node",
        F.col("deg").alias("n1"),
        F.coalesce(F.col("n2"), F.lit(0)).cast("long").alias("n2"),
        (
            F.col("deg") * 1000000 + F.coalesce(F.col("n2"), F.lit(0)) * 500000
        ).cast("long").alias("harmonic_micro"),
    )


# --- common-neighbour link prediction -----------------------------------------------------

LINK_SCORES_SQL = (
    "WITH "
    + _GRAPH_SQL.strip()
    + """,
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY src),
wedge AS (
    SELECT e1.src AS a, e1.dst AS w, e2.dst AS b
    FROM und e1 JOIN und e2 ON e1.dst = e2.src
    WHERE e1.src < e2.dst
),
cand AS (
    SELECT wg.a, wg.b,
           CAST(COUNT(*) AS BIGINT) AS cn,
           CAST(SUM(1000000 // dw.d) AS BIGINT) AS ra_micro
    FROM wedge wg JOIN deg dw ON dw.node = wg.w
    LEFT JOIN e ON e.a = wg.a AND e.b = wg.b
    WHERE e.a IS NULL
    GROUP BY wg.a, wg.b
)
SELECT c.a, c.b, c.cn,
       CAST(CAST(c.cn AS HUGEINT) * 1000000 // (da.d + db.d - c.cn) AS BIGINT)
           AS jaccard_micro,
       c.ra_micro
FROM cand c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
"""
)


@register("link_scores_common_neighbors", oracle=LINK_SCORES_SQL, covers=["J1", "J7", "A2"])
def q_link_scores_common_neighbors(spark, sf_dir):
    """Link-prediction scoring for candidate non-edges with >=1 common
    neighbour: common-neighbour count, Jaccard (cn / (deg_a + deg_b -
    cn)) and Resource-Allocation (sum 1/deg(w)), all exact integer
    micro units. Wedges join on the middle node; the existing-edge
    anti-join runs on canonical a<b pairs; degree tables join by node
    key (small — broadcast under AQE). Nothing enumerates non-edges
    blindly: candidates exist only where a wedge exists."""
    und = _und_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    e1, e2 = und.alias("e1"), und.alias("e2")
    wedge = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .select(F.col("e1.src").alias("a"), F.col("e1.dst").alias("w"), F.col("e2.dst").alias("b"))
    )
    canon = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cand = (
        wedge.join(deg.withColumnRenamed("node", "w").withColumnRenamed("d", "dw"), "w")
        .join(canon, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum(F.expr("1000000 div dw")).cast("long").alias("ra_micro"),
        )
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.expr(
                "CAST(CAST(cn AS DECIMAL(38,0)) * 1000000 div (da + db - cn) AS BIGINT)"
            ).alias("jaccard_micro"),
            "ra_micro",
        )
    )
