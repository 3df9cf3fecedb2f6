"""R2/R8/R9/R10: place, organization, event, and person-place relation
renderers (SURVEY §2.8), faithful to pfp-prefect-pipelines/
get_data_apis_vanilla.py with quirks preserved:

- render_place (:834-895): place label AND appellation label both @de; the
  APIS identifier's label is the raw integer id (untagged); the WKT space
  primitive reuses ``crm:P168_place_is_defined_by`` from both the place
  and the space-primitive node (quirk), literal typed geo:wktLiteral (F12)
- render_organization (:699-779): begin/end-of-existence events gated on
  ``len(date_written) >= 4``; the time-span is only attached when the
  machine date is also non-null
- render_event (:782-831): the role label is added twice in the reference
  (:797-799 and :808-813) — collapsed by rdflib set semantics, so a single
  template here is observably identical
- render_personplace_relation (:115-162): relation_type 595 -> birth
  place, 596 -> death place, else a generic event node + P7; the unseen
  place worklist is the anti-join feed for the second fetch round (§3.3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.functions import scalar
from prosnet_prefect_pipelines_spark.render.person import APIS_BASE
from prosnet_prefect_pipelines_spark.render.templates import Template, explode_templates, node

E33 = "crm:E33_E41_Linguistic_Appellation"


def render_place(places: DataFrame) -> DataFrame:
    """places(id, name, sameAs array, lat, lng) -> triples with datatype col.

    Reference: get_data_apis_vanilla.py:834-895.
    """
    pid = F.col("id")
    places = places.withColumns(
        {
            "_plc": node("idmapis:place.", pid),
            "_app": node("idmapis:placeappellation.", pid),
            "_ident": node("idmapis:placeidentifier.", pid),
            "_space": node("idmapis:spaceprimitive.", pid),
        }
    ).localCheckpoint(eager=False)
    plc, app, ident, space = (F.col(c) for c in ["_plc", "_app", "_ident", "_space"])
    has_coords = F.col("lat").isNotNull() & F.col("lng").isNotNull()
    ts = [
        Template(plc, "rdfs:label", F.col("name"), lang="de"),
        Template(plc, "rdf:type", F.lit("crm:E53_Place")),
        Template(plc, "crm:P1_is_identified_by", app),
        Template(app, "rdf:type", F.lit(E33)),
        Template(app, "rdfs:label", F.col("name"), lang="de"),
        Template(plc, "owl:sameAs", node(f"{APIS_BASE}/entity/", pid)),
        Template(plc, "crm:P1_is_identified_by", ident),
        # reference typo kept: E_42_Identifier (:871)
        Template(ident, "rdf:type", F.lit("crm:E_42_Identifier")),
        Template(ident, "rdfs:label", pid.cast("string")),
        # space primitive (F12 WKT literal, geo:wktLiteral)
        Template(plc, "crm:P168_place_is_defined_by", space, cond=has_coords),
        Template(space, "rdf:type", F.lit("crm:E94_Space_Primitive"), cond=has_coords),
        Template(
            space,
            "crm:P168_place_is_defined_by",
            scalar.wkt_point_literal(F.col("lng"), F.col("lat")),
            cond=has_coords,
            datatype="geo:wktLiteral",
        ),
    ]
    scalar_triples = explode_templates(places, ts, include_datatype=True)
    same = places.select(F.col("_plc").alias("plc"), F.explode("sameAs").alias("uri"))
    same_triples = explode_templates(
        same,
        [Template(F.col("plc"), "owl:sameAs", F.col("uri"))],
        include_datatype=True,
    )
    return scalar_triples.unionByName(same_triples).distinct()


def render_organization(orgs: DataFrame) -> DataFrame:
    """orgs(id, name, sameAs, start/end_date, start/end_date_written).

    Reference: get_data_apis_vanilla.py:699-779.
    """
    oid = F.col("id")
    orgs = orgs.withColumns(
        {
            "_org": node("idmapis:groupproxy.", oid),
            "_app": node("idmapis:groupappellation.", oid),
            "_start": node("idmapis:groupstart.", oid),
            "_start_span": node("idmapis:groupstart.timespan.", oid),
            "_end": node("idmapis:groupend.", oid),
            "_end_span": node("idmapis:groupend.timespan.", oid),
        }
    ).localCheckpoint(eager=False)
    org, app = F.col("_org"), F.col("_app")
    ts = [
        Template(org, "rdf:type", F.lit("crm:E74_Group")),
        Template(org, "rdf:type", F.lit("idmcore:Group")),
        Template(org, "owl:sameAs", node(f"{APIS_BASE}/entity/", oid)),
        Template(org, "crm:P1_is_identified_by", app),
        Template(app, "rdfs:label", F.col("name"), lang="de"),
        Template(app, "rdf:type", F.lit(E33)),
    ]
    for kind, ev_col, span_col, ev_type, link in [
        ("start", "_start", "_start_span", "crm:E63_Beginning_of_Existence", "crm:P92_brought_into_existence"),
        ("end", "_end", "_end_span", "crm:E64_End_of_Existence", "crm:P93_took_out_of_existence"),
    ]:
        written = F.col(f"{kind}_date_written")
        date = F.col(f"{kind}_date")
        gate = written.isNotNull() & (F.length(written) >= 4)
        ev, span = F.col(ev_col), F.col(span_col)
        ts += [
            Template(ev, "rdf:type", F.lit(ev_type), cond=gate),
            Template(ev, link, org, cond=gate),
            # time-span only when the machine date also exists (:729-740)
            Template(ev, "crm:P4_has_time-span", span, cond=gate & date.isNotNull()),
            Template(span, "rdf:type", F.lit("crm:E52_Time-Span"), cond=gate & date.isNotNull()),
        ]
        bounds = scalar.time_span_bounds(kind, written, date)
        for pred, literal in bounds.items():
            ts.append(Template(span, pred, literal, cond=gate & date.isNotNull() & literal.isNotNull()))
        if kind == "start":
            label = scalar.time_span_label(F.col("start_date_written"), F.col("end_date_written"))
            ts.append(Template(span, "rdfs:label", label, cond=gate & date.isNotNull() & label.isNotNull()))
    scalar_triples = explode_templates(orgs, ts)
    same = orgs.select(F.col("_org").alias("org"), F.explode("sameAs").alias("uri"))
    same_triples = explode_templates(
        same, [Template(F.col("org"), "owl:sameAs", F.col("uri"))]
    )
    return scalar_triples.unionByName(same_triples).distinct()


def _event_templates(event_type: str) -> list[Template]:
    """R9 render_event over a relation row (get_data_apis_vanilla.py:782-831).

    Expects columns: id, relation_type (struct), related_person (struct),
    related_place (struct), start/end dates. The duplicate role-label add
    in the reference collapses under set semantics -> one template.
    """
    rid = F.col("id")
    ev = node(f"idmapis:event.{event_type}.", rid)
    role = node(f"idmapis:{event_type}.eventrole.", rid)
    pers = node("idmapis:personproxy.", F.col("related_person.id"))
    roletype = node("idmrole:", F.col("relation_type.id"))
    span = node(f"idmapis:{event_type}.timespan.", rid)
    has_start = F.col("start_date").isNotNull()
    has_end = has_start & F.col("end_date").isNotNull()
    ts = [
        Template(role, "bioc:inheres_in", pers),
        Template(role, "rdf:type", roletype),
        Template(roletype, "rdfs:subClassOf", F.lit("bioc:Event_Role")),
        Template(roletype, "rdfs:label", F.col("relation_type.label"), lang="de"),
        Template(ev, "bioc:had_participant_in_role", role),
        Template(ev, "rdf:type", F.lit("crm:E5_Event")),
        Template(role, "rdfs:label", F.col("relation_type.label"), lang="de"),
        Template(
            ev,
            "rdfs:label",
            # f-string semantics: NULL renders as 'None' (:823-826)
            F.concat(
                F.coalesce(F.col("related_person.label"), F.lit("None")), F.lit(" "),
                F.coalesce(F.col("relation_type.label"), F.lit("None")), F.lit(" "),
                F.coalesce(F.col("related_place.label"), F.lit("None")),
            ),
            lang="de",
        ),
        Template(ev, "crm:P4_has_time-span", span, cond=has_start),
        Template(span, "rdf:type", F.lit("crm:E52_Time-Span"), cond=has_start),
    ]
    start = scalar.time_span_bounds("start", F.col("start_date_written"), F.col("start_date"))
    for pred, literal in start.items():
        ts.append(Template(span, pred, literal, cond=has_start & literal.isNotNull()))
    label = scalar.time_span_label(F.col("start_date_written"), F.col("end_date_written"))
    ts.append(Template(span, "rdfs:label", label, cond=has_start & label.isNotNull()))
    end = scalar.time_span_bounds("end", F.col("end_date_written"), F.col("end_date"))
    for pred, literal in end.items():
        ts.append(Template(span, pred, literal, cond=has_end & literal.isNotNull()))
    return ts


def render_personplace_relations(rels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R2: -> (triples, place_worklist).

    relation_type 595 -> birthevent P7, 596 -> deathevent P7, otherwise a
    generic personplace event (R9) + P7. The worklist is the distinct set
    of referenced place ids — the §3.3 second-round anti-join feed.
    Reference: get_data_apis_vanilla.py:115-162.
    """
    rels = rels.localCheckpoint(eager=False)
    place_uri = node("idmapis:place.", F.col("related_place.id"))
    rt = F.col("relation_type.id")
    p7 = [
        Template(
            node("idmapis:birthevent.", F.col("related_person.id")),
            "crm:P7_took_place_at", place_uri, cond=rt == 595,
        ),
        Template(
            node("idmapis:deathevent.", F.col("related_person.id")),
            "crm:P7_took_place_at", place_uri, cond=rt == 596,
        ),
        Template(
            node("idmapis:event.personplace.", F.col("id")),
            "crm:P7_took_place_at", place_uri, cond=~rt.isin(595, 596),
        ),
    ]
    generic = rels.filter(~rt.isin(595, 596))
    triples = (
        explode_templates(rels, p7)
        .unionByName(explode_templates(generic, _event_templates("personplace")))
        .distinct()
    )
    worklist = rels.select(F.col("related_place.id").alias("place_id")).distinct()
    return triples, worklist
