"""Golden-fixture test: one APIS person -> exact expected triple set.

Expected triples hand-derived from the reference's render_person
(get_data_apis_vanilla.py:513-674) + create_time_span_tripels (:32-112).
"""

from __future__ import annotations

from prosnet_prefect_pipelines_spark import model
from prosnet_prefect_pipelines_spark.render.person import materialize_inverses, render_person

PERSON = {
    "id": 7,
    "name": "Musterfrau",
    "first_name": "Eva",
    "start_date": "1901-02-03",
    "start_date_written": "1901",          # year-only -> closed-interval bounds
    "end_date": "1980-05-06",
    "end_date_written": "1980-05-06",      # full date -> suffix bounds
    "gender": "female",
    "profession": [
        {"id": 42, "label": "Autorin", "parent_id": 9},
        {"id": 43, "label": "Malerin", "parent_id": None},
    ],
    "sameAs": ["http://d-nb.info/gnd/123"],
    "text": [{"url": "http://t/full"}, {"url": "http://t/short"}],
}

P = "idmapis:personproxy.7"
APP = "idmapis:appellation.label.7"

EXPECTED = {
    (P, "rdf:type", "crm:E21_Person", None),
    (P, "rdf:type", "idmcore:Person_Proxy", None),
    (P, "rdfs:label", "Eva Musterfrau", "de"),
    (P, "owl:sameAs", "https://apis.acdh.oeaw.ac.at/entity/7", None),
    (APP, "rdf:type", "crm:E33_E41_Linguistic_Appellation", None),
    (APP, "rdfs:label", "Musterfrau, Eva", "de"),
    (P, "crm:P1_is_identified_by", APP, None),
    ("idmapis:appellation.first_name.7", "rdf:type", "crm:E33_E41_Linguistic_Appellation", None),
    ("idmapis:appellation.first_name.7", "rdfs:label", "Eva", "de"),
    (APP, "crm:P148_has_component", "idmapis:appellation.first_name.7", None),
    ("idmapis:appellation.last_name.7", "rdf:type", "crm:E33_E41_Linguistic_Appellation", None),
    ("idmapis:appellation.last_name.7", "rdfs:label", "Musterfrau", "de"),
    (APP, "crm:P148_has_component", "idmapis:appellation.last_name.7", None),
    # birth event (start_date present)
    ("idmapis:born_person.7", "bioc:inheres_in", P, None),
    ("idmapis:born_person.7", "rdf:type", "idmrole:born_person", None),
    ("idmrole:born_person", "rdfs:subClassOf", "bioc:Event_Role", None),
    ("idmapis:birthevent.7", "bioc:had_participant_in_role", "idmapis:born_person.7", None),
    ("idmapis:birthevent.7", "rdf:type", "crm:E67_Birth", None),
    ("idmapis:birthevent.7", "rdfs:label", "Birth of Eva Musterfrau", None),  # untagged (quirk)
    ("idmapis:birthevent.7", "crm:P4_has_time-span", "idmapis:birth.timespan.7", None),
    ("idmapis:birthevent.7", "crm:P98_brought_into_life", P, None),
    ("idmapis:birth.timespan.7", "rdf:type", "crm:E52_Time-Span", None),
    # year-only start: closed year interval
    ("idmapis:birth.timespan.7", "crm:P82a_begin_of_the_begin", "1901-01-01T00:00:00", None),
    ("idmapis:birth.timespan.7", "crm:P81a_end_of_the_begin", "1901-12-31T23:59:59", None),
    ("idmapis:birth.timespan.7", "rdfs:label", "1901 - 1980-05-06", None),
    # death event
    ("idmapis:deceased_person.7", "bioc:inheres_in", P, None),
    ("idmapis:deceased_person.7", "rdf:type", "idmrole:deceased_person", None),
    ("idmrole:deceased_person", "rdfs:subClassOf", "bioc:Event_Role", None),
    ("idmapis:deathevent.7", "bioc:had_participant_in_role", "idmapis:deceased_person.7", None),
    ("idmapis:deathevent.7", "rdf:type", "crm:E69_Death", None),
    ("idmapis:deathevent.7", "rdfs:label", "Death of Eva Musterfrau", "de"),  # @de (quirk)
    ("idmapis:deathevent.7", "crm:P4_has_time-span", "idmapis:death.timespan.7", None),
    ("idmapis:deathevent.7", "crm:P100_was_death_of", P, None),
    ("idmapis:death.timespan.7", "rdf:type", "crm:E52_Time-Span", None),
    # full-date end: suffix form, no begin_of_the_end
    ("idmapis:death.timespan.7", "crm:P82b_end_of_the_end", "1980-05-06T23:59:59", None),
    # gender capitalized
    (P, "bioc:has_gender", "bioc:Female", None),
    # professions
    (P, "bioc:has_occupation", "idmapis:occupation.42", None),
    ("idmapis:occupation.42", "rdfs:label", "Autorin", "de"),
    ("idmapis:occupation.42", "rdfs:subClassOf", "idmapis:occupation.9", None),
    ("idmapis:occupation.42", "rdfs:subClassOf", "bioc:Occupation", None),
    (P, "bioc:has_occupation", "idmapis:occupation.43", None),
    ("idmapis:occupation.43", "rdfs:label", "Malerin", "de"),
    ("idmapis:occupation.43", "rdfs:subClassOf", "bioc:Occupation", None),
    # sameAs list
    (P, "owl:sameAs", "http://d-nb.info/gnd/123", None),
    # bio links (len(text) > 1)
    (P, "idmcore:bio_link", "idmapis:text.7.bio", None),
    ("idmapis:text.7.bio", "idmcore:full_bio_link", "http://t/full", None),
    ("idmapis:text.7.bio", "idmcore:short_bio_link", "http://t/short", None),
}


def test_render_person_golden(spark):
    df = spark.createDataFrame([PERSON], model.APIS_PERSON_SCHEMA)
    got = {(r.s, r.p, r.o, r.o_lang) for r in render_person(df).collect()}
    assert got == EXPECTED


def test_minimal_person_no_optionals(spark):
    minimal = {
        "id": 1, "name": None, "first_name": None, "start_date": None,
        "end_date": None, "start_date_written": None, "end_date_written": None,
        "gender": "", "profession": [], "sameAs": [], "text": [],
    }
    df = spark.createDataFrame([minimal], model.APIS_PERSON_SCHEMA)
    got = {(r.s, r.p, r.o, r.o_lang) for r in render_person(df).collect()}
    p = "idmapis:personproxy.1"
    app = "idmapis:appellation.label.1"
    assert got == {
        (p, "rdf:type", "crm:E21_Person", None),
        (p, "rdf:type", "idmcore:Person_Proxy", None),
        (p, "rdfs:label", "None None", "de"),  # f-string quirk
        (p, "owl:sameAs", "https://apis.acdh.oeaw.ac.at/entity/1", None),
        (app, "rdf:type", "crm:E33_E41_Linguistic_Appellation", None),
        (app, "rdfs:label", "-, -", "de"),
        (p, "crm:P1_is_identified_by", app, None),
    }


def test_inverse_materialization(spark):
    df = spark.createDataFrame([PERSON], model.APIS_PERSON_SCHEMA)
    triples = materialize_inverses(render_person(df))
    got = {(r.s, r.p, r.o) for r in triples.collect()}
    assert ("idmapis:personproxy.7", "bioc:bearer_of", "idmapis:born_person.7") in got
    assert ("idmapis:personproxy.7", "bioc:bearer_of", "idmapis:deceased_person.7") in got
