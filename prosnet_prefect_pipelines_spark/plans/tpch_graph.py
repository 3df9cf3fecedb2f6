"""Deterministic RDF-triples view derived from the driver's TPC-H-ish tables.

The reference's relational semantics live in SPARQL over RDF graphs
(SURVEY §2.3); the driver's correctness gate runs on TPC-H-ish parquet.
Bridge: derive a canonical triples table (s, p, o, o_lang) from
nation/region/customer/part **identically** in Spark (this module) and in
DuckDB SQL (``TRIPLES_CTE`` — prefixed onto the oracle queries), so every
graph operator (BGP join, OPTIONAL, property path closure, label-service
join, sameAs components) is checked end-to-end against an oracle.

Content mirrors FIXTURES.md A1:
- entity/type/label triples with mixed `en`/`de` language tags
  (language fallback tests — reference lang filters at
  prosnet-prefect-pipelines/sparql/wikidata-person.sparql:20)
- a `wdt:P279` subclass tree ≥10 levels deep derived from part keys
  (property-path closure, sparql/wikidata-city.sparql:6)
- an `owl:sameAs` graph of chains with deterministic breaks
  (entity resolution, pfp-prefect-pipelines/sparql/
  create_provided_entities_graph_v2.sparql:10-27)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DuckDB-side definition. MUST stay semantically identical to
# triples_from_tpch() below; both derive only from the parquet views.
TRIPLES_CTE = """
triples AS (
    SELECT 'urn:nation/' || CAST(n_nationkey AS VARCHAR) AS s,
           'rdf:type' AS p, 'ex:Nation' AS o, CAST(NULL AS VARCHAR) AS o_lang
    FROM nation
    UNION ALL
    SELECT 'urn:nation/' || CAST(n_nationkey AS VARCHAR), 'ex:label', n_name, 'en'
    FROM nation
    UNION ALL
    SELECT 'urn:nation/' || CAST(n_nationkey AS VARCHAR), 'ex:label', 'DE ' || n_name, 'de'
    FROM nation WHERE n_nationkey % 2 = 0
    UNION ALL
    SELECT 'urn:nation/' || CAST(n_nationkey AS VARCHAR), 'ex:inRegion',
           'urn:region/' || CAST(n_regionkey AS VARCHAR), NULL
    FROM nation
    UNION ALL
    SELECT 'urn:region/' || CAST(r_regionkey AS VARCHAR), 'rdf:type', 'ex:Region', NULL
    FROM region
    UNION ALL
    SELECT 'urn:region/' || CAST(r_regionkey AS VARCHAR), 'ex:label', r_name, 'en'
    FROM region
    UNION ALL
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR), 'rdf:type', 'ex:Person', NULL
    FROM customer
    UNION ALL
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR), 'ex:label', c_name, NULL
    FROM customer
    UNION ALL
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR), 'ex:nation',
           'urn:nation/' || CAST(c_nationkey AS VARCHAR), NULL
    FROM customer
    UNION ALL
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR), 'ex:segment', c_mktsegment, NULL
    FROM customer WHERE c_mktsegment IS NOT NULL
    UNION ALL
    -- subclass tree: every part key points at its integer half (root = 1)
    SELECT 'urn:class/' || CAST(p_partkey AS VARCHAR), 'wdt:P279',
           'urn:class/' || CAST(CAST(FLOOR(p_partkey / 2) AS BIGINT) AS VARCHAR), NULL
    FROM part WHERE p_partkey >= 2
    UNION ALL
    -- sameAs chains: consecutive customers linked, broken at multiples of 10
    -- and where c_acctbal < 0 (deterministic irregular cluster shapes)
    SELECT 'urn:cust/' || CAST(c_custkey AS VARCHAR), 'owl:sameAs',
           'urn:cust/' || CAST(c_custkey - 1 AS VARCHAR), NULL
    FROM customer WHERE c_custkey % 10 <> 1 AND c_acctbal >= 0
    UNION ALL
    -- pre-existing provided-entity proxies for a sparse subset of customers
    SELECT 'urn:proxy/' || CAST(c_custkey AS VARCHAR), 'pfp:proxy_for',
           'urn:cust/' || CAST(c_custkey AS VARCHAR), NULL
    FROM customer WHERE c_custkey % 50 = 0
)
"""


def triples_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the triples DataFrame; see TRIPLES_CTE for the oracle twin."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    def t(s, p, o, o_lang=None):
        lang = F.lit(o_lang).cast("string") if o_lang is None else F.lit(o_lang)
        return [s.alias("s"), F.lit(p).alias("p"), o.alias("o"), lang.alias("o_lang")]

    nat_s = F.concat(F.lit("urn:nation/"), F.col("n_nationkey").cast("string"))
    reg_s = F.concat(F.lit("urn:region/"), F.col("r_regionkey").cast("string"))
    cust_s = F.concat(F.lit("urn:cust/"), F.col("c_custkey").cast("string"))

    parts = [
        nation.select(*t(nat_s, "rdf:type", F.lit("ex:Nation"))),
        nation.select(*t(nat_s, "ex:label", F.col("n_name"), "en")),
        nation.filter(F.col("n_nationkey") % 2 == 0).select(
            *t(nat_s, "ex:label", F.concat(F.lit("DE "), F.col("n_name")), "de")
        ),
        nation.select(
            *t(nat_s, "ex:inRegion", F.concat(F.lit("urn:region/"), F.col("n_regionkey").cast("string")))
        ),
        region.select(*t(reg_s, "rdf:type", F.lit("ex:Region"))),
        region.select(*t(reg_s, "ex:label", F.col("r_name"), "en")),
        customer.select(*t(cust_s, "rdf:type", F.lit("ex:Person"))),
        customer.select(*t(cust_s, "ex:label", F.col("c_name"))),
        customer.select(
            *t(cust_s, "ex:nation", F.concat(F.lit("urn:nation/"), F.col("c_nationkey").cast("string")))
        ),
        customer.filter(F.col("c_mktsegment").isNotNull()).select(
            *t(cust_s, "ex:segment", F.col("c_mktsegment"))
        ),
        part.filter(F.col("p_partkey") >= 2).select(
            *t(
                F.concat(F.lit("urn:class/"), F.col("p_partkey").cast("string")),
                "wdt:P279",
                F.concat(F.lit("urn:class/"), F.floor(F.col("p_partkey") / 2).cast("long").cast("string")),
            )
        ),
        customer.filter((F.col("c_custkey") % 10 != 1) & (F.col("c_acctbal") >= 0)).select(
            *t(cust_s, "owl:sameAs", F.concat(F.lit("urn:cust/"), (F.col("c_custkey") - 1).cast("string")))
        ),
        customer.filter(F.col("c_custkey") % 50 == 0).select(
            *t(
                F.concat(F.lit("urn:proxy/"), F.col("c_custkey").cast("string")),
                "pfp:proxy_for",
                cust_s,
            )
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
