"""Pipeline batch 83 (north-star extension): spatial analytics with
exact integer geometry — grid density, nearest-hub assignment, bbox
joins, grid-DBSCAN clustering, and radius self-joins.

Coordinates are deterministic hash-derived micro-degree integers (the
corpus has no geo columns; the derivation is part of each query, same
formula in both engines). All distances are SQUARED Euclidean in
micro-degree² — argmin/threshold tests never need sqrt or trig, so
every comparison is exact integer arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# Deterministic point cloud from customer keys: lat/lng micro-degrees in
# a ~[0, 1e6) square (1 degree).
_PT_SQL = """
pts AS (
    SELECT c_custkey AS id,
           (c_custkey * 2654435761) % 1000000 AS x,
           (c_custkey * 40503 + 7) % 1000000 AS y
    FROM customer
)
"""


def _pts(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    return c.select(
        k.alias("id"),
        ((k * 2654435761) % 1000000).alias("x"),
        ((k * 40503 + 7) % 1000000).alias("y"),
    )


# ---------------------------------------------------------------------------
# grid density.

GRID_SQL = f"""
WITH {_PT_SQL}
SELECT CAST(x // 100000 AS BIGINT) AS gx, CAST(y // 100000 AS BIGINT) AS gy,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(id) AS BIGINT) AS min_id
FROM pts GROUP BY gx, gy
"""


@register("geo_grid_density", oracle=GRID_SQL, covers=["A2"])
def q_geo_grid_density(spark, sf_dir):
    """Spatial grid density: the point cloud binned into a 10x10
    0.1-degree grid — the tile-aggregation every map heat layer runs.
    Cell ids are truncating integer division of micro-degrees; one
    narrow pass + one grouped rollup."""
    pts = _pts(spark, sf_dir)
    return pts.select(
        F.expr("CAST(x div 100000 AS BIGINT)").alias("gx"),
        F.expr("CAST(y div 100000 AS BIGINT)").alias("gy"),
        "id",
    ).groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("id").cast("long").alias("min_id"),
    )


# ---------------------------------------------------------------------------
# nearest-hub assignment (squared distance argmin).

HUBS_SQL = """
hubs AS (
    SELECT n_nationkey AS hub,
           (n_nationkey * 123457) % 1000000 AS hx,
           (n_nationkey * 76543 + 11) % 1000000 AS hy
    FROM nation
)
"""

NEAREST_HUB_SQL = f"""
WITH {_PT_SQL}, {HUBS_SQL},
scored AS (
    SELECT p.id, h.hub,
           (p.x - h.hx) * (p.x - h.hx) + (p.y - h.hy) * (p.y - h.hy) AS d2,
           row_number() OVER (
               PARTITION BY p.id
               ORDER BY (p.x - h.hx) * (p.x - h.hx)
                        + (p.y - h.hy) * (p.y - h.hy), h.hub
           ) AS rn
    FROM pts p CROSS JOIN hubs h
)
SELECT CAST(hub AS BIGINT) AS hub,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(MIN(d2) AS BIGINT) AS closest_d2,
       CAST(MAX(d2) AS BIGINT) AS farthest_d2
FROM scored WHERE rn = 1 GROUP BY hub
"""


@register("geo_nearest_hub", oracle=NEAREST_HUB_SQL, covers=["O6", "A2"])
def q_geo_nearest_hub(spark, sf_dir):
    """Nearest-hub assignment: every point assigned to its closest of
    25 hubs by SQUARED Euclidean distance (exact integers — argmin
    never needs the square root), hub-id tie-break; per-hub assignment
    counts with closest/farthest d². The hub table broadcasts; the
    argmin window partitions by point over a 25-row candidate set."""
    pts = _pts(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    hubs = n.select(
        k.alias("hub"),
        ((k * 123457) % 1000000).alias("hx"),
        ((k * 76543 + 11) % 1000000).alias("hy"),
    )
    d2 = (F.col("x") - F.col("hx")) * (F.col("x") - F.col("hx")) + (
        F.col("y") - F.col("hy")
    ) * (F.col("y") - F.col("hy"))
    scored = pts.crossJoin(F.broadcast(hubs)).select(
        "id", "hub", d2.alias("d2")
    )
    w = Window.partitionBy("id").orderBy("d2", "hub")
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.groupBy("hub").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.min("d2").cast("long").alias("closest_d2"),
        F.max("d2").cast("long").alias("farthest_d2"),
    ).select(F.col("hub").cast("long").alias("hub"), "n_assigned", "closest_d2", "farthest_d2")


# ---------------------------------------------------------------------------
# bbox containment join.

BBOX_SQL = f"""
WITH {_PT_SQL},
boxes AS (
    SELECT r_regionkey AS box,
           (r_regionkey * 173000) % 800000 AS x0,
           (r_regionkey * 291000 + 50000) % 800000 AS y0
    FROM region
)
SELECT CAST(b.box AS BIGINT) AS box,
       CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(MIN(p.id) AS BIGINT) AS min_id
FROM boxes b JOIN pts p
  ON p.x >= b.x0 AND p.x < b.x0 + 200000
 AND p.y >= b.y0 AND p.y < b.y0 + 200000
GROUP BY b.box
"""


@register("geo_bbox_join", oracle=BBOX_SQL, covers=["J1", "A2"])
def q_geo_bbox_join(spark, sf_dir):
    """Bounding-box containment join: points inside each of 5
    0.2-degree boxes via pure range predicates on integer coordinates —
    the viewport/geofence query. The tiny box table broadcasts and the
    point cloud is scanned once; at scale the grid-cell pre-key (as in
    the radius join) bounds the candidate pairs."""
    pts = _pts(spark, sf_dir)
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    k = F.col("r_regionkey")
    boxes = r.select(
        k.alias("box"),
        ((k * 173000) % 800000).alias("x0"),
        ((k * 291000 + 50000) % 800000).alias("y0"),
    )
    j = F.broadcast(boxes).join(
        pts,
        (F.col("x") >= F.col("x0"))
        & (F.col("x") < F.col("x0") + 200000)
        & (F.col("y") >= F.col("y0"))
        & (F.col("y") < F.col("y0") + 200000),
    )
    return j.groupBy("box").agg(
        F.count(F.lit(1)).cast("long").alias("n_inside"),
        F.min("id").cast("long").alias("min_id"),
    ).select(F.col("box").cast("long").alias("box"), "n_inside", "min_id")


# ---------------------------------------------------------------------------
# grid-DBSCAN: dense cells merged into clusters via adjacency.

DBSCAN_SQL = f"""
WITH RECURSIVE {_PT_SQL},
cells AS (
    SELECT x // 100000 AS gx, y // 100000 AS gy, COUNT(*) AS n
    FROM pts GROUP BY gx, gy
),
dense AS (SELECT gx, gy, n FROM cells WHERE n >= 3),
ids AS (SELECT gx, gy, n, gx * 1000 + gy AS cid FROM dense),
adj AS (
    SELECT a.cid AS u, b.cid AS v
    FROM ids a JOIN ids b
      ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
),
reach AS (
    SELECT u, v FROM adj
    UNION
    SELECT r.u, a.v FROM reach r JOIN adj a ON a.u = r.v
),
lbl AS (SELECT u AS cid, MIN(v) AS cluster FROM reach GROUP BY u)
SELECT CAST(l.cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(i.n) AS BIGINT) AS n_points
FROM lbl l JOIN ids i ON i.cid = l.cid
GROUP BY l.cluster
"""


@register("geo_grid_dbscan", oracle=DBSCAN_SQL, covers=["J9", "A2"])
def q_geo_grid_dbscan(spark, sf_dir):
    """Grid-DBSCAN: 0.1-degree cells with >= 3 points are dense cores;
    8-adjacent dense cells merge into clusters via connected
    components — the scalable grid formulation of density clustering
    (cell keys shard the plane; the CC runs over the DENSE-CELL graph,
    which is tiny relative to the points). The oracle closes the
    adjacency with a recursive CTE."""
    from prosnet_prefect_pipelines_spark.operators.graph import (
        connected_components,
    )

    pts = _pts(spark, sf_dir)
    cells = pts.select(
        F.expr("CAST(x div 100000 AS BIGINT)").alias("gx"),
        F.expr("CAST(y div 100000 AS BIGINT)").alias("gy"),
    ).groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("n"))
    dense = cells.filter(F.col("n") >= 3).withColumn(
        "cid", F.col("gx") * 1000 + F.col("gy")
    )
    a = dense.select(F.col("cid").alias("u"), "gx", "gy")
    b = dense.select(F.col("cid").alias("v"), F.col("gx").alias("gx2"), F.col("gy").alias("gy2"))
    adj = (
        a.join(
            b,
            (F.abs(F.col("gx") - F.col("gx2")) <= 1)
            & (F.abs(F.col("gy") - F.col("gy2")) <= 1),
        )
        .filter(F.col("u") != F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    linked = connected_components(adj)
    # ISOLATED dense cells (no dense neighbor) are their own clusters —
    # the components operator only sees edge endpoints
    singles = dense.join(
        linked, dense["cid"] == linked["node"], "left_anti"
    ).select(F.col("cid").alias("node"), F.col("cid").alias("comp"))
    cc = linked.unionByName(singles)
    return (
        cc.join(dense, cc["node"] == dense["cid"])
        .groupBy(F.col("comp").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
        )
        .select(F.col("cluster").cast("long").alias("cluster"), "n_cells", "n_points")
    )


# ---------------------------------------------------------------------------
# radius self-join via grid buckets.

RADIUS_SQL = f"""
WITH {_PT_SQL},
g AS (
    SELECT id, x, y, x // 50000 AS gx, y // 50000 AS gy FROM pts
),
cand AS (
    SELECT a.id AS a, b.id AS b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM g a JOIN g b
      ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1 AND a.id < b.id
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, CAST(d2 AS BIGINT) AS d2
FROM cand WHERE d2 <= 2500000000
"""


@register("geo_pairs_within_radius", oracle=RADIUS_SQL, covers=["J1", "O6"])
def q_geo_pairs_within_radius(spark, sf_dir):
    """Radius self-join: point pairs within 0.05 degrees, generated
    ONLY through 3x3 neighborhoods of a 0.05-degree grid (a pair within
    the radius cannot span more than one cell boundary), then verified
    by exact squared distance — the spatial near-pair join with the
    same bucket-grid shape as range_join/interval_overlap; never an
    all-pairs product."""
    pts = _pts(spark, sf_dir)
    g = pts.select(
        "id",
        "x",
        "y",
        F.expr("CAST(x div 50000 AS BIGINT)").alias("gx"),
        F.expr("CAST(y div 50000 AS BIGINT)").alias("gy"),
    )
    # scale shape: the probe side EXPLODES to its 3x3 neighbor cells and
    # the join is a pure EQUI join on the cell key (a hash/sort-merge
    # join that shuffles on cells) — an abs-difference predicate would
    # force a nested-loop plan
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    a = g.select(
        F.col("id").alias("a"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("cgx"),
                        (F.col("gy") + dy).alias("cgy"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("cell"),
    ).select("a", "ax", "ay", F.col("cell.cgx").alias("cgx"), F.col("cell.cgy").alias("cgy"))
    b = g.select(
        F.col("id").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("gx").alias("cgx"), F.col("gy").alias("cgy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["cgx", "cgy"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", d2.alias("d2"))
        .filter(F.col("d2") <= 2_500_000_000)
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("d2").cast("long").alias("d2"),
        )
    )
