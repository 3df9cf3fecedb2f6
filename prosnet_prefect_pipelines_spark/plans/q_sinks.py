"""Source/sink-surface queries: K4 N-Triples serialization with R11
prefix expansion, oracle-checked line-for-line."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.tpch_graph import TRIPLES_CTE, triples_from_tpch
from prosnet_prefect_pipelines_spark.render import namespaces
from prosnet_prefect_pipelines_spark.sources.rdf import triples_to_ntriples

_EXPAND_SQL = """
CASE WHEN {x} LIKE 'ex:%' THEN 'https://example.org/schema/' || substr({x}, 4)
     WHEN {x} LIKE 'rdf:%' THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#' || substr({x}, 5)
     WHEN {x} LIKE 'owl:%' THEN 'http://www.w3.org/2002/07/owl#' || substr({x}, 5)
     WHEN {x} LIKE 'wdt:%' THEN 'http://www.wikidata.org/prop/direct/' || substr({x}, 5)
     WHEN {x} LIKE 'pfp:%' THEN 'https://pfp-schema.acdh.oeaw.ac.at/schema#' || substr({x}, 5)
     ELSE {x} END
"""

NTRIPLES_SQL = f"""
WITH {TRIPLES_CTE}
SELECT '<' || {_EXPAND_SQL.format(x="s")} || '> <' || {_EXPAND_SQL.format(x="p")} || '> '
       || CASE WHEN o_lang IS NULL AND (o LIKE 'urn:%' OR o LIKE 'ex:%')
               THEN '<' || {_EXPAND_SQL.format(x="o")} || '>'
               ELSE '"' || replace(replace(replace(o, '\\', '\\\\'), '"', '\\"'), chr(10), '\\n')
                    || '"'
                    || CASE WHEN o_lang IS NOT NULL THEN '@' || o_lang ELSE '' END
          END || ' .' AS line
FROM triples
"""


@register("ntriples_serialize", oracle=NTRIPLES_SQL, covers=["K4", "R11", "S9", "S10"])
def q_ntriples_serialize(spark, sf_dir):
    """K4: triples -> N-Triples lines with R11 prefix expansion — the RDF
    writer's exact formatting, checked line-for-line (serialize_graph,
    get_data_apis_vanilla.py:1050-1074)."""
    t = triples_from_tpch(spark, sf_dir)
    expanded = t.select(
        namespaces.expand(F.col("s")).alias("s"),
        namespaces.expand(F.col("p")).alias("p"),
        F.when(
            F.col("o_lang").isNull() & (F.col("o").startswith("urn:") | F.col("o").startswith("ex:")),
            namespaces.expand(F.col("o")),
        ).otherwise(F.col("o")).alias("o"),
        F.col("o_lang"),
        (F.col("o_lang").isNull() & (F.col("o").startswith("urn:") | F.col("o").startswith("ex:"))).alias("_is_uri"),
    )
    return triples_to_ntriples(expanded, object_is_uri=F.col("_is_uri"))
