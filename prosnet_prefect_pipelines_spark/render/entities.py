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


FAMILY_RELATIONS = [5870, 5871, 5741, 5414, 5413, 5412, 5411]


def render_personperson_relations(rels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R3: person-person relations; family vs person predicate chosen by
    relation_type membership in the 7-element family list.

    Reference: get_data_apis_vanilla.py:165-271. The ``relation_type is
    None`` else-branch there (:266-270) is dead code (the dict is always
    present); live semantics: the subclass triples hang off the parent
    when there is one, else off the type itself.
    Returns (triples, personB worklist).
    """
    rels = rels.localCheckpoint(eager=False)
    rt = F.col("relation_type.id")
    is_family = rt.isin(FAMILY_RELATIONS)
    rel_pred = F.when(is_family, F.lit("bioc:has_family_relation")).otherwise(
        F.lit("bioc:has_person_relation")
    )
    role_cls = F.when(is_family, F.lit("bioc:Family_Relationship_Role")).otherwise(
        F.lit("bioc:Person_Relationship_Role")
    )
    pers_a = node("idmapis:personproxy.", F.col("related_person.id"))
    pers_b = node("idmapis:personproxy.", F.col("related_personB.id"))
    n_rel = node("idmapis:personrelation.", F.col("id"))
    n_reltype = node("idmrelations:", rt)
    parent = F.col("relation_type.parent_id")
    n_parent = node("idmrelations:", parent)
    ts = [
        Template(pers_a, rel_pred, n_rel),
        Template(n_rel, "rdf:type", n_reltype),
        Template(n_rel, "rdfs:label", F.col("relation_type.label"), lang="de"),
        Template(pers_b, "bioc:bearer_of", n_rel),
        Template(n_reltype, "rdfs:subClassOf", n_parent, cond=parent.isNotNull()),
        Template(n_parent, "rdfs:subClassOf", role_cls, cond=parent.isNotNull()),
        Template(n_reltype, "rdfs:subClassOf", role_cls, cond=parent.isNull()),
    ]
    triples = explode_templates(rels, ts).distinct()
    worklist = rels.select(F.col("related_personB.id").alias("person_id")).distinct()
    return triples, worklist


def render_organizationplace_relations(rels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R7: org residence triples + place worklist
    (get_data_apis_vanilla.py:677-696)."""
    rels = rels.localCheckpoint(eager=False)
    triples = explode_templates(
        rels,
        [
            Template(
                node("idmapis:groupproxy.", F.col("related_institution.id")),
                "crm:P74_has_current_or_former_residence",
                node("idmapis:place.", F.col("related_place.id")),
            )
        ],
    ).distinct()
    worklist = rels.select(F.col("related_place.id").alias("place_id")).distinct()
    return triples, worklist


def render_personinstitution_relations(
    rels: DataFrame, residence_triples: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """R6: career events (get_data_apis_vanilla.py:352-510) + J8 residence
    propagation.

    Quirks kept: the person-role hierarchy uses ``rdf:type`` (not
    subClassOf) toward the parent role (:433-441); the career time-span
    node is attached when either date exists (:471-479) while its bound
    triples come from whichever dates are present.

    J8 (:481-485): the reference copies whatever P74 residence objects are
    already in the rdflib graph at render time — an order-dependent
    read-your-writes join. Here it is the full deterministic join against
    ``residence_triples`` (R7 output) — a documented strengthening, same
    rationale as the deterministic proxy ids (SURVEY §7).
    Returns (triples, institution worklist).
    """
    rels = rels.localCheckpoint(eager=False)
    rid = F.col("id")
    rt = F.col("relation_type.id")
    parent = F.col("relation_type.parent_id")
    pers = node("idmapis:personproxy.", F.col("related_person.id"))
    inst = node("idmapis:groupproxy.", F.col("related_institution.id"))
    n_rel = node("idmapis:grouprelation.", rid)
    grouprole_t = node("idmapis:grouprole.", rt)
    career = node("idmapis:career.", rid)
    span = node("idmapis:career.timespan.", rid)
    persrole = node("idmapis:personrole.", rid, ".", F.col("related_person.id"))
    persrole_t = node("idmapis:personrole.", rt)
    grouprole_inst = node("idmapis:grouprole.", rid, ".", F.col("related_institution.id"))
    fstr = lambda c: F.coalesce(c.cast("string"), F.lit("None"))  # noqa: E731
    has_start = F.col("start_date").isNotNull()
    has_end = F.col("end_date").isNotNull()
    ts = [
        Template(pers, "bioc:has_group_relation", n_rel),
        Template(n_rel, "rdf:type", grouprole_t),
        Template(grouprole_t, "rdfs:subClassOf", node("idmapis:grouprole.", parent),
                 cond=parent.isNotNull()),
        Template(n_rel, "rdfs:label", F.col("relation_type.label"), lang="de"),
        Template(n_rel, "bioc:inheres_in", inst),
        Template(career, "rdf:type", F.lit("idmcore:Career")),
        Template(F.lit("idmcore:Career"), "rdfs:subClassOf", F.lit("crm:E5_Event")),
        Template(
            career, "rdfs:label",
            F.concat(fstr(F.col("related_person.label")), F.lit(" "),
                     fstr(F.col("relation_type.label")), F.lit(" "),
                     fstr(F.col("related_institution.label"))),
            lang="de",
        ),
        Template(career, "bioc:had_participant_in_role", persrole),
        Template(pers, "bioc:bearer_of", persrole),
        Template(persrole, "rdf:type", persrole_t),
        # quirk: rdf:type (not subClassOf) toward the parent role (:433)
        Template(persrole_t, "rdf:type", node("idmapis:personrole.", parent),
                 cond=parent.isNotNull()),
        Template(career, "bioc:had_participant_in_role", grouprole_inst),
        Template(grouprole_inst, "rdf:type", F.lit("bioc:Group_Relationship_Role")),
        Template(grouprole_inst, "bioc:inheres_in", inst),
        Template(career, "crm:P4_has_time-span", span, cond=has_start | has_end),
    ]
    for kind, cond in [("start", has_start), ("end", has_end)]:
        bounds = scalar.time_span_bounds(
            kind, F.col(f"{kind}_date_written"), F.col(f"{kind}_date")
        )
        for pred, literal in bounds.items():
            ts.append(Template(span, pred, literal, cond=cond & literal.isNotNull()))
        if kind == "start":
            label = scalar.time_span_label(
                F.col("start_date_written"), F.col("end_date_written")
            )
            ts.append(Template(span, "rdfs:label", label, cond=cond & label.isNotNull()))
        # E52 typing comes from create_time_span_tripels for each kind
        ts.append(Template(span, "rdf:type", F.lit("crm:E52_Time-Span"), cond=cond))
    triples = explode_templates(rels, ts)
    if residence_triples is not None:
        # J8: copy the institution's residences onto the career as P7
        res = residence_triples.filter(
            F.col("p") == "crm:P74_has_current_or_former_residence"
        ).select(F.col("s").alias("_inst"), F.col("o").alias("_plc"))
        j8 = (
            rels.select(career.alias("career"), inst.alias("_inst"))
            .join(res, on="_inst")
            .select(
                F.col("career").alias("s"),
                F.lit("crm:P7_took_place_at").alias("p"),
                F.col("_plc").alias("o"),
                F.lit(None).cast("string").alias("o_lang"),
            )
        )
        triples = triples.unionByName(j8)
    worklist = rels.select(F.col("related_institution.id").alias("institution_id")).distinct()
    return triples.distinct(), worklist


def render_personroles(roles: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R4/R5: role-vocabulary rendering (get_data_apis_vanilla.py:274-349).

    roles(id, label, parent_id) -> (triples, parent worklist):
    - every role gets its rdfs:label @de
    - roles WITHOUT a parent are typed bioc:Actor_Role (:317-319, :347-349)
    - parents not themselves in the batch go to the worklist (the
      reference's glob_list_vocabs second-round fetch, :312-316) — the
      existence probe becomes a left_anti join (J7)
    """
    roles = roles.localCheckpoint(eager=False)
    n_role = node("idmapis:personrole.", F.col("id"))
    ts = [
        Template(n_role, "rdfs:label", F.col("label"), lang="de"),
        Template(n_role, "rdf:type", F.lit("bioc:Actor_Role"),
                 cond=F.col("parent_id").isNull()),
    ]
    triples = explode_templates(roles, ts).distinct()
    known = roles.select(F.col("id").alias("parent_id")).distinct()
    worklist = (
        roles.filter(F.col("parent_id").isNotNull())
        .select("parent_id")
        .distinct()
        .join(known, on="parent_id", how="left_anti")
    )
    return triples, worklist
