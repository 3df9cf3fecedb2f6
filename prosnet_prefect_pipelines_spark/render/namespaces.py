"""R11: namespace prefix table (create_base_graph,
get_data_apis_vanilla.py:960-1047 declares 20 prefixes on the rdflib
Dataset). The engine carries compact prefixed names in the triples table;
serializers expand them here."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIXES: dict[str, str] = {
    "crm": "http://www.cidoc-crm.org/cidoc-crm/",
    "bioc": "http://ldf.fi/schema/bioc/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "geo": "http://www.opengis.net/ont/geosparql#",
    "idmcore": "https://www.intavia.eu/idm-core/",
    "idmrole": "https://www.intavia.eu/idm-role/",
    "idmapis": "https://www.intavia.eu/apis/",
    "pfp": "https://pfp-schema.acdh.oeaw.ac.at/schema#",
    "wdt": "http://www.wikidata.org/prop/direct/",
    "wd": "http://www.wikidata.org/entity/",
    "ex": "https://example.org/schema/",
    "urn:nation": "urn:nation",
    "urn:region": "urn:region",
}


def expand(term: Column) -> Column:
    """Compact prefixed name -> full URI; terms that are already full URIs
    (or have no known prefix) pass through unchanged."""
    out = term
    for prefix, uri in PREFIXES.items():
        if prefix.startswith("urn:"):
            continue
        out = F.when(
            term.startswith(prefix + ":"),
            F.concat(F.lit(uri), term.substr(F.lit(len(prefix) + 2), F.length(term))),
        ).otherwise(out)
    return out
