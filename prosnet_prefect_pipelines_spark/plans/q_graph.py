"""Graph-operator queries: property-path closure (J5), sameAs components
(J9), and the full entity-resolution CONSTRUCT (R13/F15).

Oracles use DuckDB recursive CTEs — the ANSI-SQL twin of the engine's
iterative fixpoint operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark import resolve
from prosnet_prefect_pipelines_spark.operators import graph as G
from prosnet_prefect_pipelines_spark.operators import relational as R
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.tpch_graph import TRIPLES_CTE, triples_from_tpch

# --- J5: wdt:P279* transitive closure (reflexive) -------------------------------

# DuckDB needs WITH RECURSIVE at the head, so the edge derivation is
# inlined rather than composed from TRIPLES_CTE (same rows by construction).
CLOSURE_SQL = """
WITH RECURSIVE
edges AS (
    SELECT 'urn:class/' || CAST(p_partkey AS VARCHAR) AS src,
           'urn:class/' || CAST(CAST(FLOOR(p_partkey / 2) AS BIGINT) AS VARCHAR) AS dst
    FROM part WHERE p_partkey >= 2
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
nodes AS (
    -- NB: inside WITH RECURSIVE, duckdb 1.0 does not dedup a plain UNION
    -- in a non-recursive CTE -> explicit DISTINCT
    SELECT DISTINCT n FROM (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges) t
)
SELECT src, dst FROM reach
UNION ALL
SELECT n, n FROM nodes
"""


@register("closure_subclass", oracle=CLOSURE_SQL, covers=["J5"])
def q_closure_subclass(spark, sf_dir):
    """`?c wdt:P279* ?ancestor` — reflexive transitive closure over the
    subclass tree (sparql/wikidata-city.sparql:6). Iterative frontier
    expansion with per-round localCheckpoint (SURVEY §7 hard part 1)."""
    triples = triples_from_tpch(spark, sf_dir)
    edges = R.triple_pattern(triples, "?src", "wdt:P279", "?dst")
    # the subclass tree is deep (halving chains ~log2(|part|) levels) but
    # the pair count is modest -> path doubling: O(log depth) rounds
    return G.transitive_closure(edges, reflexive=True, method="doubling")


# --- J9: sameAs connected components ---------------------------------------------

COMPONENTS_SQL = """
WITH RECURSIVE
sameas AS (
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR) AS s,
           'urn:cust/' || CAST(c_custkey - 1 AS VARCHAR) AS o
    FROM customer WHERE c_custkey % 10 <> 1 AND c_acctbal >= 0
),
undirected AS (
    SELECT DISTINCT a, b FROM (
        SELECT s AS a, o AS b FROM sameas UNION ALL SELECT o, s FROM sameas
    ) t
),
reach(src, dst) AS (
    SELECT a, b FROM undirected
    UNION
    SELECT r.src, u.b FROM reach r JOIN undirected u ON r.dst = u.a
),
nodes AS (SELECT DISTINCT a AS node FROM undirected)
SELECT n.node, least(n.node, min(r.dst)) AS comp
FROM nodes n LEFT JOIN reach r ON n.node = r.src
GROUP BY n.node
"""


@register("sameas_components", oracle=COMPONENTS_SQL, covers=["J9"])
def q_sameas_components(spark, sf_dir):
    """Connected components over the owl:sameAs graph — min-member label,
    pointer-jumping fixpoint (create_provided_entities_graph_v2.sparql:10-27)."""
    triples = triples_from_tpch(spark, sf_dir)
    edges = R.triple_pattern(triples, "?src", "owl:sameAs", "?dst")
    return G.connected_components(edges).select("node", "comp")


# --- J9/R13/F15: full entity resolution --------------------------------------------

RESOLUTION_SQL = """
WITH RECURSIVE
sameas AS (
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR) AS s,
           'urn:cust/' || CAST(c_custkey - 1 AS VARCHAR) AS o
    FROM customer WHERE c_custkey % 10 <> 1 AND c_acctbal >= 0
),
persons AS (SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR) AS entity FROM customer),
proxies AS (
    SELECT 'urn:proxy/' || CAST(c_custkey AS VARCHAR) AS proxy,
           'urn:cust/' || CAST(c_custkey AS VARCHAR) AS entity
    FROM customer WHERE c_custkey % 50 = 0
),
undirected AS (
    SELECT DISTINCT a, b FROM (
        SELECT s AS a, o AS b FROM sameas UNION ALL SELECT o, s FROM sameas
    ) t
),
reach(src, dst) AS (
    SELECT a, b FROM undirected
    UNION
    SELECT r.src, u.b FROM reach r JOIN undirected u ON r.dst = u.a
),
comps AS (
    SELECT src AS node, least(src, min(dst)) AS comp FROM reach GROUP BY src
),
labeled AS (
    SELECT p.entity, coalesce(c.comp, p.entity) AS comp
    FROM persons p LEFT JOIN comps c ON p.entity = c.node
),
existing AS (
    SELECT l.comp, min(x.proxy) AS existing_proxy
    FROM labeled l JOIN proxies x ON l.entity = x.entity
    GROUP BY l.comp
),
resolved AS (
    SELECT l.entity,
           coalesce(e.existing_proxy, 'urn:provided_entity/' || sha256(l.comp)) AS proxy
    FROM labeled l LEFT JOIN existing e ON l.comp = e.comp
)
SELECT entity AS s, 'pfp:proxy_for' AS p, proxy AS o FROM resolved
UNION ALL
SELECT DISTINCT proxy, 'rdf:type', 'pfp:provided_entity' FROM resolved
"""


@register("entity_resolution", oracle=RESOLUTION_SQL, covers=["J9", "R13", "F15", "F14"])
def q_entity_resolution(spark, sf_dir):
    """sameAs clusters -> one provided-entity proxy per cluster: keep the
    (min) existing proxy, else mint sha256(min member) — the deterministic
    strengthening of the reference's STRUUID (SURVEY §7 step 7)."""
    triples = triples_from_tpch(spark, sf_dir)
    persons = R.triple_pattern(triples, "?entity", "rdf:type", "ex:Person")
    edges = R.triple_pattern(triples, "?src", "owl:sameAs", "?dst")
    proxies = R.triple_pattern(triples, "?proxy", "pfp:proxy_for", "?entity")
    resolved = resolve.resolve_same_as(persons, edges, proxies)
    return resolve.provided_entity_triples(resolved)


# --- BFS hop levels (shortest unweighted paths from a root) ---------------------

BFS_ROOT = "urn:class/7"

BFS_HOPS_SQL = f"""
WITH RECURSIVE
edges AS (
    SELECT 'urn:class/' || CAST(p_partkey AS VARCHAR) AS child,
           'urn:class/' || CAST(CAST(FLOOR(p_partkey / 2) AS BIGINT) AS VARCHAR) AS parent
    FROM part WHERE p_partkey >= 2
),
reach(node, hops) AS (
    SELECT '{BFS_ROOT}', CAST(0 AS BIGINT)
    UNION ALL
    SELECT e.child, r.hops + 1
    FROM reach r JOIN edges e ON e.parent = r.node
    WHERE r.hops < 60
)
SELECT node, MIN(hops) AS hops FROM reach GROUP BY node
"""


@register("shortest_hops", oracle=BFS_HOPS_SQL, covers=["J5"])
def q_shortest_hops(spark, sf_dir):
    """Minimum hop count from a root class to every descendant — BFS
    layering over the subclass tree (edges reversed to parent->child).
    Each frontier round is one keyed join + anti-join, materialized to
    truncate lineage; round count = graph depth. The unweighted
    shortest-path primitive next to closure/components/PageRank."""
    triples = triples_from_tpch(spark, sf_dir)
    edges = R.triple_pattern(triples, "?src", "wdt:P279", "?dst")
    down = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return G.bfs_levels(down, [BFS_ROOT])
