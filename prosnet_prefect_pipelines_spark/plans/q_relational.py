"""Relational-core queries (SURVEY §2.3 joins, §2.5 sort/limit/distinct).

Graph-shaped operators run over the deterministic triples view
(plans/tpch_graph.py) so BGP/OPTIONAL/label-service semantics are checked
against the DuckDB twin; plain relational operators run on the base tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import relational as R
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.tpch_graph import TRIPLES_CTE, triples_from_tpch

# --- J1: BGP inner join ------------------------------------------------------

BGP_JOIN_SQL = f"""
WITH {TRIPLES_CTE}
SELECT t2.o AS n, t3.o AS nlabel, t4.o AS r, CAST(COUNT(*) AS BIGINT) AS n_persons
FROM triples t1
JOIN triples t2 ON t1.s = t2.s AND t2.p = 'ex:nation'
JOIN triples t3 ON t2.o = t3.s AND t3.p = 'ex:label' AND t3.o_lang = 'en'
JOIN triples t4 ON t2.o = t4.s AND t4.p = 'ex:inRegion'
WHERE t1.p = 'rdf:type' AND t1.o = 'ex:Person'
GROUP BY t2.o, t3.o, t4.o
"""


@register("bgp_join", oracle=BGP_JOIN_SQL, covers=["J1", "A1"])
def q_bgp_join(spark, sf_dir):
    """Multi-pattern WHERE as chained equi-joins on shared variables.

    SPARQL shape: ?c rdf:type ex:Person . ?c ex:nation ?n .
                  ?n ex:label ?nlabel (en) . ?n ex:inRegion ?r
    (sparql/wikidata-person.sparql:7-10 analog).
    """
    triples = triples_from_tpch(spark, sf_dir)
    matched = R.bgp(
        triples,
        [
            ("?c", "rdf:type", "ex:Person"),
            ("?c", "ex:nation", "?n"),
            ("?n", "ex:label", "?nlabel", "en"),
            ("?n", "ex:inRegion", "?r"),
        ],
    )
    return matched.groupBy("n", "nlabel", "r").agg(F.count(F.lit(1)).alias("n_persons"))


# --- J2: OPTIONAL = left outer join ------------------------------------------

OPTIONAL_JOIN_SQL = """
SELECT o.o_orderkey, o.o_orderpriority, l.qty_late, l.n_late
FROM orders o
LEFT JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_late,
           CAST(COUNT(*) AS BIGINT) AS n_late
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_orderkey
) l ON o.o_orderkey = l.l_orderkey
"""


@register("optional_join", oracle=OPTIONAL_JOIN_SQL, covers=["J2", "P7"])
def q_optional_join(spark, sf_dir):
    """OPTIONAL{...FILTER...}: the filter narrows the right side BEFORE the
    join — unmatched left rows survive with NULLs (wikidata-person.sparql:18-21)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    late = (
        lineitem.filter(F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty_late"),
            F.count(F.lit(1)).alias("n_late"),
        )
    )
    return R.optional_join(
        orders, late, on=[orders.o_orderkey == late.l_orderkey]
    ).select("o_orderkey", "o_orderpriority", "qty_late", "n_late")


# --- J3/O5: UNION branches + enclosing DISTINCT --------------------------------

UNION_BRANCHES_SQL = """
SELECT DISTINCT c_custkey FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
) u
"""


@register("union_branches", oracle=UNION_BRANCHES_SQL, covers=["J3", "O5", "O3"])
def q_union_branches(spark, sf_dir):
    """SPARQL UNION is bag union; dedup only via the enclosing DISTINCT
    (wikidata-organization.sparql:2-16)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    branches = [
        customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        customer.filter(F.col("c_acctbal") < 0).select("c_custkey"),
    ]
    return R.union_all(branches).distinct()


# --- J4: VALUES inline table ---------------------------------------------------

VALUES_JOIN_SQL = """
SELECT c.c_custkey, n.n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NATION_19')
"""


@register("values_join", oracle=VALUES_JOIN_SQL, covers=["J4"])
def q_values_join(spark, sf_dir):
    """VALUES ?location {...} -> InSet filter + broadcast-joined dimension
    (wikidata-organization.sparql:18-19)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    wanted = R.values_join(nation, "n_name", ["NATION_3", "NATION_7", "NATION_11", "NATION_19"])
    return customer.join(
        F.broadcast(wanted), customer.c_nationkey == wanted.n_nationkey
    ).select("c_custkey", "n_name")


# --- J6: label service with language fallback ----------------------------------

LABEL_FALLBACK_SQL = f"""
WITH {TRIPLES_CTE},
nations AS (SELECT s FROM triples WHERE p = 'rdf:type' AND o = 'ex:Nation'),
de AS (SELECT s, o FROM triples WHERE p = 'ex:label' AND o_lang = 'de'),
en AS (SELECT s, o FROM triples WHERE p = 'ex:label' AND o_lang = 'en')
SELECT n.s AS entity, coalesce(de.o, en.o) AS label
FROM nations n LEFT JOIN de ON n.s = de.s LEFT JOIN en ON n.s = en.s
"""


@register("label_fallback", oracle=LABEL_FALLBACK_SQL, covers=["J6", "F13", "F14"])
def q_label_fallback(spark, sf_dir):
    """SERVICE wikibase:label "de,en" -> per-language left joins + coalesce
    (wikidata-person.sparql:22). Only even nation keys carry a `de` label."""
    triples = triples_from_tpch(spark, sf_dir)
    nations = R.triple_pattern(triples, "?entity", "rdf:type", "ex:Nation")
    return R.label_service_join(nations, triples, "entity", langs=("de", "en"))


# --- J7: existence anti-join ----------------------------------------------------

ANTI_JOIN_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
)
"""


@register("anti_join_unseen", oracle=ANTI_JOIN_SQL, covers=["J7", "S7"])
def q_anti_join_unseen(spark, sf_dir):
    """`(uri, None, None) not in g` guard -> left_anti against seen subjects
    (get_data_apis_vanilla.py:524-525); here: customers with no pre-1996
    order — the worklist of entities still to fetch/render (§3.3)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seen = (
        orders.filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return R.exists_anti_join(customer.select("c_custkey"), seen, on="c_custkey")


# --- O1/O2: order + limit, pagination window ------------------------------------

TOPK_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
"""


@register("order_limit_topk", oracle=TOPK_SQL, covers=["O1", "O2"])
def q_order_limit_topk(spark, sf_dir):
    """ORDER BY + LIMIT with a deterministic tiebreak (TakeOrderedAndProject —
    no global sort materialized)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


PAGINATE_SQL = """
SELECT o_orderkey, o_orderpriority FROM (
    SELECT o_orderkey, o_orderpriority,
           row_number() OVER (ORDER BY o_orderkey) AS rn
    FROM orders
) t WHERE rn > 100 AND rn <= 300
"""


@register("paginate_window", oracle=PAGINATE_SQL, covers=["O2", "O1"])
def q_paginate_window(spark, sf_dir):
    """LIMIT $limit OFFSET $offset emulation over a stable key — the
    reference's disjoint pagination windows (wikidata-person.sparql:14-16)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return R.paginate(
        orders.select("o_orderkey", "o_orderpriority"), ["o_orderkey"], offset=100, limit=200
    )


# --- O3/O4: DISTINCT -------------------------------------------------------------

DISTINCT_SQL = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""


@register("distinct_pairs", oracle=DISTINCT_SQL, covers=["O3", "O4"])
def q_distinct_pairs(spark, sf_dir):
    """SELECT DISTINCT over a column pair (wikidata-person.sparql:4)."""
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey", "c_mktsegment"
    ).distinct()
