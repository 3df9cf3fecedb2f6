"""The reference's four entry-point flows as DataFrame pipeline
compositions (SURVEY §3). Orchestration (cron, k8s Jobs, Prefect flows)
is delegated to external job submission per BASELINE.json; these are the
engine-side dataflows each flow runs.

§3.1 create_typesense_index_from_sparql_query -> typesense_index_pipeline
§3.2 get_apis_data_and_push_to_gitlab        -> apis_ttl_aggregation_pipeline
§3.3 create_apis_rdf_serialization_v3        -> apis_cidoc_pipeline
§3.4 enrich_via_sparql                        -> enrich_pipeline
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark import resolve, sinks
from prosnet_prefect_pipelines_spark.operators.relational import exists_anti_join
from prosnet_prefect_pipelines_spark.plans.person_index import build_person_docs
from prosnet_prefect_pipelines_spark.render import entities as E
from prosnet_prefect_pipelines_spark.render.person import materialize_inverses, render_person
from prosnet_prefect_pipelines_spark.sources import rdf


def typesense_index_pipeline(
    bindings: DataFrame,
    make_client: Callable[[], sinks.UpsertClient] | None = None,
) -> DataFrame:
    """§3.1: bindings -> docs -> (optional) idempotent upsert sink.

    The reference's offset-pagination loop (wikidata_index.py:291-319)
    disappears; the doc build is build_person_docs (P1/P4/P3/P5) and the
    sink is the K1/K2 foreachPartition upsert.
    """
    docs = build_person_docs(bindings)
    if make_client is not None:
        sinks.upsert_foreach_partition(docs, make_client)
    return docs


def apis_ttl_aggregation_pipeline(
    ttl_page_lines: DataFrame,
    named_graph: str,
    out_path: str | None = None,
) -> DataFrame:
    """§3.2: fetched RDF text pages -> parsed triples -> named-graph union
    -> serialized lines (git/MR publication is a driver-side hook).

    ``ttl_page_lines``: one N-Triples line per row (the S4 fetch layer's
    output after page splitting).
    """
    triples = rdf.ntriples_to_triples(ttl_page_lines).withColumn("g", F.lit(named_graph))
    if out_path is not None:
        rdf.write_ntriples(triples, out_path)
    return triples


def apis_cidoc_pipeline(
    persons: DataFrame,
    personplace_rels: DataFrame,
    personperson_rels: DataFrame,
    personinstitution_rels: DataFrame,
    orgplace_rels: DataFrame,
    fetch_places: Callable[[DataFrame], DataFrame],
    fetch_orgs: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """§3.3: the 1.3 kLoC JSON->CIDOC flow as a statically-unrolled
    2-round dataflow.

    Round 1 renders persons + all relation kinds; the worklists the
    reference accumulates in thread-shared globals
    (get_data_apis_vanilla.py:155-162, 1250-1275) become anti-join feeds
    (J7): places/institutions referenced but not yet rendered are fetched
    (``fetch_*`` maps an id worklist to entity rows — injected, like the
    HTTP layer) and rendered in round 2. Global-graph mutation becomes a
    union of per-stage triple frames; serialize-time inverses (R12) close
    the flow.
    """
    person_triples = render_person(persons)
    pp_triples, place_wl1 = E.render_personplace_relations(personplace_rels)
    persper_triples, _person_wl = E.render_personperson_relations(personperson_rels)
    op_triples, place_wl2 = E.render_organizationplace_relations(orgplace_rels)
    pi_triples, inst_wl = E.render_personinstitution_relations(
        personinstitution_rels, residence_triples=op_triples
    )

    # round 2: fetch + render entities discovered in the worklists
    place_wl = place_wl1.unionByName(place_wl2).distinct()
    place_triples = E.render_place(fetch_places(place_wl)).drop("o_datatype")
    org_entities = fetch_orgs(inst_wl)
    org_triples = E.render_organization(org_entities)

    all_triples = (
        person_triples.unionByName(pp_triples)
        .unionByName(persper_triples)
        .unionByName(op_triples)
        .unionByName(pi_triples)
        .unionByName(place_triples)
        .unionByName(org_triples)
        .distinct()
    )
    return materialize_inverses(all_triples)


def enrich_pipeline(triples: DataFrame, out_path: str | None = None) -> DataFrame:
    """§3.4: loaded RDF -> sameAs entity resolution -> provided-entity
    CONSTRUCT appended -> serialized (enrich_via_sparql.py:146-166).
    """
    entities = (
        triples.filter(F.col("p") == "rdf:type")
        .select(F.col("s").alias("entity"))
        .distinct()
    )
    edges = triples.filter(F.col("p") == "owl:sameAs").select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    proxies = triples.filter(F.col("p") == "pfp:proxy_for").select(
        F.col("s").alias("proxy"), F.col("o").alias("entity")
    )
    resolved = resolve.resolve_same_as(entities, edges, proxies)
    provided = resolve.provided_entity_triples(resolved).withColumn(
        "o_lang", F.lit(None).cast("string")
    )
    out = triples.select("s", "p", "o", "o_lang").unionByName(provided)
    if out_path is not None:
        rdf.write_ntriples(out, out_path)
    return out


def second_round_worklist(candidates: DataFrame, rendered_subjects: DataFrame, on: str) -> DataFrame:
    """Helper: the reference's `not in g` probe over a worklist (J7)."""
    return exists_anti_join(candidates, rendered_subjects, on)
