"""owl:sameAs entity resolution (SURVEY §2.3 J9, §2.8 R13, §7 step 7).

The reference resolves sameAs clusters with a SPARQL CONSTRUCT over
pyoxigraph (pfp-prefect-pipelines/sparql/create_provided_entities_graph_v2.sparql):
pick an existing provided-entity proxy if any cluster member has one
(COALESCE(?uri_exist, ?uri_new), :22), else mint a fresh STRUUID (:21).

STRUUID is nondeterministic per run; we strengthen to deterministic ids —
``sha256(min cluster member)`` — so re-runs are stable and incremental
upserts idempotent (documented semantics change, SURVEY §7 hard part 3).
Cluster identity comes from connected components over the sameAs graph:
SPARQL's single-hop `[] owl2:sameAs ?sa_uri` join under-merges transitive
chains; components are the correct closure of the intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.graph import connected_components

PROVIDED_ENTITY_NS = "urn:provided_entity/"


def resolve_same_as(
    entities: DataFrame,
    sameas_edges: DataFrame,
    existing_proxies: DataFrame,
) -> DataFrame:
    """-> (entity, proxy) with one proxy per sameAs cluster.

    ``entities``: single column ``entity`` (all entities to resolve;
    singletons allowed). ``sameas_edges``: columns ``src, dst``.
    ``existing_proxies``: columns ``proxy, entity`` (pfp:proxy_for rows).
    """
    comps = connected_components(sameas_edges, "src", "dst")
    return resolve_from_components(entities, comps, existing_proxies)


def resolve_from_components(
    entities: DataFrame,
    comps: DataFrame,
    existing_proxies: DataFrame,
) -> DataFrame:
    """resolve_same_as with the component labeling precomputed —
    ``comps``: columns ``node, comp`` (min-member labels). Shared by the
    batch path (components from connected_components) and the streaming
    monitor (components accumulated incrementally by
    streaming/resolve.IncrementalResolver)."""
    labeled = entities.join(
        comps.withColumnRenamed("node", "entity"), on="entity", how="left"
    ).withColumn("comp", F.coalesce(F.col("comp"), F.col("entity")))

    # min existing proxy per cluster (deterministic pick where the
    # reference's OPTIONAL join picks arbitrarily)
    existing = (
        labeled.join(existing_proxies, on="entity")
        .groupBy("comp")
        .agg(F.min("proxy").alias("existing_proxy"))
    )
    return (
        labeled.join(existing, on="comp", how="left")
        .withColumn(
            "proxy",
            F.coalesce(
                F.col("existing_proxy"),
                F.concat(F.lit(PROVIDED_ENTITY_NS), F.sha2(F.col("comp"), 256)),
            ),
        )
        .select("entity", "proxy")
    )


def provided_entity_triples(resolved: DataFrame) -> DataFrame:
    """R13: CONSTRUCT `?entity pfp:proxy_for ?proxy` + proxy typing triples.

    Reference: create_provided_entities_graph_v2.sparql:5-8.
    """
    link = resolved.select(
        F.col("entity").alias("s"), F.lit("pfp:proxy_for").alias("p"), F.col("proxy").alias("o")
    )
    typ = resolved.select(
        F.col("proxy").alias("s"), F.lit("rdf:type").alias("p"),
        F.lit("pfp:provided_entity").alias("o"),
    ).distinct()
    return link.unionByName(typ)
