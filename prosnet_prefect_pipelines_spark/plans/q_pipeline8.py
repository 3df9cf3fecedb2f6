"""Training-data pipeline queries, batch 8 (north-star extension):
bounded k-core decomposition and PMI collocation mining.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.graph import kcore_peel
from prosnet_prefect_pipelines_spark.operators.textstats import tokens
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# k-core (bounded peel, SQL-replayable)

_KCORE_K, _KCORE_ROUNDS = 4, 6


def _peel_rounds_sql(rounds: int, k: int) -> str:
    parts = []
    for r in range(rounds):
        parts.append(
            f"""deg{r} AS MATERIALIZED (
    SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM e{r} UNION ALL SELECT b AS n FROM e{r}
    ) t GROUP BY n
),
keep{r} AS MATERIALIZED (SELECT n FROM deg{r} WHERE d >= {k}),
e{r + 1} AS MATERIALIZED (
    SELECT e.a, e.b FROM e{r} e
    JOIN keep{r} ka ON ka.n = e.a
    JOIN keep{r} kb ON kb.n = e.b
)"""
        )
    return ",\n".join(parts)


KCORE_SQL = f"""
WITH m AS (
    SELECT COUNT(*) // 10 + 1 AS m1, COUNT(*) // 10 + 3 AS m2 FROM orders
),
raw AS (SELECT o_orderkey % m1 AS u, o_orderkey % m2 AS v FROM orders, m),
e0 AS MATERIALIZED (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM raw WHERE u <> v
),
{_peel_rounds_sql(_KCORE_ROUNDS, _KCORE_K)}
SELECT node, CAST(degree AS BIGINT) AS degree FROM (
    SELECT n AS node, COUNT(*) AS degree FROM (
        SELECT a AS n FROM e{_KCORE_ROUNDS}
        UNION ALL SELECT b AS n FROM e{_KCORE_ROUNDS}
    ) t GROUP BY n
) f WHERE degree >= {_KCORE_K}
"""


@register("kcore_nodes", oracle=KCORE_SQL, covers=["J9", "A2"])
def q_kcore_nodes(spark, sf_dir):
    """X-KCORE: 4-core of the orders-derived graph via bounded peeling
    (6 rounds — past the graph's true peel depth, so the fixpoint is
    reached and extra rounds are no-ops). The FIXED round count is what
    gives the computation an ANSI-SQL twin: the oracle replays every
    peel round CTE-by-CTE. Per round, degree agg + two semi-joins over
    the shrinking survivor set."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    m1, m2 = n // 10 + 1, n // 10 + 3
    k = F.col("o_orderkey")
    edges = orders.select((k % m1).alias("src"), (k % m2).alias("dst"))
    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# PMI collocations

_PMI_MIN_C = 5

PMI_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
),
bigrams AS (
    SELECT l[i] AS x, l[i + 1] AS y
    FROM toks, unnest(generate_series(1, len(l) - 1)) AS t(i)
),
cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM bigrams GROUP BY x, y),
uni AS (
    SELECT token, COUNT(*) AS c FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ) t GROUP BY token
),
tot AS (SELECT SUM(c) AS n_total FROM uni),
scored AS (
    SELECT cxy.x, cxy.y, cxy.c_xy,
           CAST(CAST(cxy.c_xy AS HUGEINT) * n_total * 1000000
                // (ux.c * uy.c) AS BIGINT) AS pmi_ratio_micro
    FROM cxy
    JOIN uni ux ON ux.token = cxy.x
    JOIN uni uy ON uy.token = cxy.y
    CROSS JOIN tot
    WHERE cxy.c_xy >= {_PMI_MIN_C}
)
SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy, pmi_ratio_micro FROM scored
ORDER BY pmi_ratio_micro DESC, x, y LIMIT 30
"""


@register("pmi_collocations", oracle=PMI_SQL, covers=["A2", "O1"])
def q_pmi_collocations(spark, sf_dir):
    """X-PMI: top-30 collocations by the integer PMI ratio
    P(x,y)/(P(x)P(y)) in micro units (c_xy * N * 1e6 div c_x*c_y — the
    log is monotone, so ranking by the ratio IS ranking by PMI, with
    engine-exact arithmetic; at extreme corpus sizes the product goes
    through DECIMAL). Bigram + unigram aggregations, both map-side
    combined; unigram table joins back token-keyed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(tokens(F.col("text")).alias("l"))
    bigrams = toks.select(
        F.posexplode(
            F.zip_with(
                F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
                F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("_p", "bg")
    ).select(F.col("bg.x").alias("x"), F.col("bg.y").alias("y"))
    cxy = bigrams.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # joined twice + total
    )
    tot = uni.agg(F.sum("c").alias("n_total"))
    scored = (
        cxy.filter(F.col("c_xy") >= _PMI_MIN_C)
        .join(uni.select(F.col("token").alias("x"), F.col("c").alias("c_x")), on="x")
        .join(uni.select(F.col("token").alias("y"), F.col("c").alias("c_y")), on="y")
        .join(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.expr(
                "CAST(c_xy AS DECIMAL(38,0)) * n_total * 1000000 div (c_x * c_y)"
            ).alias("pmi_ratio_micro"),
        )
    )
    return scored.orderBy(F.col("pmi_ratio_micro").desc(), "x", "y").limit(30)


# ---------------------------------------------------------------------------
# local clustering coefficients

from prosnet_prefect_pipelines_spark.operators.graph import triangle_corners  # noqa: E402

CLUSTERING_SQL = """
WITH m AS (
    SELECT COUNT(*) // 10 + 1 AS m1, COUNT(*) // 10 + 3 AS m2 FROM orders
),
raw AS (SELECT o_orderkey % m1 AS u, o_orderkey % m2 AS v FROM orders, m),
e AS MATERIALIZED (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM raw WHERE u <> v
),
tri AS MATERIALIZED (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
    SELECT n, COUNT(*) AS t FROM (
        SELECT x AS n FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    ) c GROUP BY n
),
deg AS (
    SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
    ) t GROUP BY n
)
SELECT d.n AS node, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles,
       CAST(CAST(2 * COALESCE(p.t, 0) AS HUGEINT) * 1000000
            // (d.d * (d.d - 1)) AS BIGINT) AS coef_micro
FROM deg d LEFT JOIN per_node p ON p.n = d.n
WHERE d.d >= 2
"""


@register("clustering_coefficient", oracle=CLUSTERING_SQL, covers=["J1", "A2"])
def q_clustering_coefficient(spark, sf_dir):
    """X-CLUSTER-COEF: local clustering coefficient per node — triangles
    from the degree-ordered corner enumeration (arboricity-bounded),
    exploded to per-node counts, over wedge count d*(d-1)/2 in micro
    units. The community-structure statistic a graph audit reports."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    m1, m2 = n // 10 + 1, n // 10 + 3
    k = F.col("o_orderkey")
    edges = orders.select((k % m1).alias("src"), (k % m2).alias("dst"))
    corners = triangle_corners(edges)
    per_node = (
        corners.select(F.col("x").alias("n"))
        .unionByName(corners.select(F.col("y").alias("n")))
        .unionByName(corners.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.join(per_node, on="n", how="left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("n").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("triangles"),
            F.expr(
                "CAST(2 * COALESCE(t, 0) AS DECIMAL(38,0)) * 1000000 div (d * (d - 1))"
            ).alias("coef_micro"),
        )
    )
