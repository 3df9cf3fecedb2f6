"""Pipeline batch 41: graph motifs + robust statistics —

- ``square_count``: global 4-cycle (square) count — the second graph
  motif after triangles, the basis of bipartite-ish clustering
  coefficients. Every square a-x-b-y-a is seen from its two diagonals
  {a,b} and {x,y}: with cn(a,b) = common neighbours, squares =
  (1/2) * sum over unordered pairs of C(cn, 2). Reuses the wedge
  enumeration shape (join on the middle node, one pair-keyed count) —
  cost sum deg(w)^2, linear at constant degree, identical to
  triangle/link-score passes.
- ``trimmed_mean_exact``: 10%-trimmed mean per event type in exact
  cents — rank windows drop the bottom and top decile (by value, id
  tie-break), the mean of the middle is one integer division. The
  robust-location statistic that, unlike winsorize (which clamps),
  discards the tails.

Scale notes: squares aggregate wedges by endpoint pair (map-side
combined; hub pairs are the skew — the same AQE/salting levers as the
link-score join). Trimmed mean uses keyed rank windows (per event
type) and one keyed aggregation; never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline28 import _GRAPH_SQL, _und_edges

SQUARES_SQL = (
    "WITH "
    + _GRAPH_SQL.strip()
    + """,
wedge AS (
    SELECT e1.src AS a, e2.dst AS b
    FROM und e1 JOIN und e2 ON e1.dst = e2.src
    WHERE e1.src < e2.dst
),
cn AS (
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM wedge GROUP BY a, b
)
SELECT CAST(SUM(w * (w - 1) // 2) // 2 AS BIGINT) AS squares,
       CAST(COUNT(*) AS BIGINT) AS connected_pairs,
       CAST(MAX(w) AS BIGINT) AS max_common_neighbors
FROM cn
"""
)


@register("square_count", oracle=SQUARES_SQL, covers=["J1", "A2"])
def q_square_count(spark, sf_dir):
    """Global square (C4) count on the sf-scaled orders graph: wedges
    grouped by endpoint pair give common-neighbour counts; each square
    contributes C(2,2)=1 at each of its two diagonals, so total =
    sum C(cn,2) / 2. One wedge join + one pair-keyed aggregation —
    the same linear-at-constant-degree shape as triangle counting."""
    und = _und_edges(spark, sf_dir).localCheckpoint(eager=False)  # 2 self-join sides
    e1, e2 = und.alias("e1"), und.alias("e2")
    cn = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") < F.col("e2.dst"))
        .groupBy(F.col("e1.src").alias("a"), F.col("e2.dst").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return cn.agg(
        F.expr("CAST(SUM(w * (w - 1) div 2) div 2 AS BIGINT)").alias("squares"),
        F.count(F.lit(1)).cast("long").alias("connected_pairs"),
        F.max("w").cast("long").alias("max_common_neighbors"),
    )


TRIMMED_SQL = """
WITH v AS (
    SELECT event_type, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
),
ranked AS (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM v
),
mid AS (
    SELECT event_type, cents, n FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(cents) AS BIGINT) AS kept_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
FROM mid GROUP BY event_type
"""


@register("trimmed_mean_exact", oracle=TRIMMED_SQL, covers=["A2", "O1"])
def q_trimmed_mean_exact(spark, sf_dir):
    """10%-trimmed mean per event type, exact cents: keyed rank window
    (value, event_id tie-break), drop floor(n/10) rows from each tail,
    integer mean of the rest. Windows partition by event type — never
    global; the trim boundaries are integer rank comparisons, so both
    engines keep identical membership."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") > F.expr("n div 10")) & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    )
    return mid.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("cents").cast("long").alias("kept_cents"),
        F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias("trimmed_mean_cents"),
    )
