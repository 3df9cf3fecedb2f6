"""Oracle queries for the R2/R8/R9/R10 renderers (place, organization,
person-place relation events), over entity rows derived from
nation/supplier/orders in both engines."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.render import entities as E

# --- R10: places from nation ---------------------------------------------------

PLACE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("sameAs", T.ArrayType(T.StringType())),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
    ]
)


def places_from_tpch(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    return nation.select(
        k.cast("long").alias("id"),
        F.col("n_name").alias("name"),
        F.array_compact(
            F.array(
                F.concat(F.lit("http://geo/"), k.cast("string")),
                F.when(k % 5 == 0, F.concat(F.lit("http://gn/"), k.cast("string"))),
            )
        ).alias("sameAs"),
        F.when(k % 4 != 0, ((k % 180) - 90 + 0.25).cast("double")).alias("lat"),
        F.when(k % 4 != 0, ((k % 360) - 180 + 0.5).cast("double")).alias("lng"),
    )


RENDER_PLACE_SQL = """
WITH place AS (
    SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
           CASE WHEN n_nationkey % 4 <> 0
                THEN CAST((n_nationkey % 180) - 90 + 0.25 AS DOUBLE) END AS lat,
           CASE WHEN n_nationkey % 4 <> 0
                THEN CAST((n_nationkey % 360) - 180 + 0.5 AS DOUBLE) END AS lng
    FROM nation
),
p2 AS (
    SELECT *,
           'idmapis:place.' || CAST(id AS VARCHAR) AS plc,
           'idmapis:placeappellation.' || CAST(id AS VARCHAR) AS app,
           'idmapis:placeidentifier.' || CAST(id AS VARCHAR) AS ident,
           'idmapis:spaceprimitive.' || CAST(id AS VARCHAR) AS space
    FROM place
),
triples AS (
    SELECT plc AS s, 'rdfs:label' AS p, name AS o, 'de' AS o_lang, CAST(NULL AS VARCHAR) AS o_datatype FROM p2
    UNION ALL SELECT plc, 'rdf:type', 'crm:E53_Place', NULL, NULL FROM p2
    UNION ALL SELECT plc, 'crm:P1_is_identified_by', app, NULL, NULL FROM p2
    UNION ALL SELECT app, 'rdf:type', 'crm:E33_E41_Linguistic_Appellation', NULL, NULL FROM p2
    UNION ALL SELECT app, 'rdfs:label', name, 'de', NULL FROM p2
    UNION ALL SELECT plc, 'owl:sameAs', 'https://apis.acdh.oeaw.ac.at/entity/' || CAST(id AS VARCHAR), NULL, NULL FROM p2
    UNION ALL SELECT plc, 'crm:P1_is_identified_by', ident, NULL, NULL FROM p2
    UNION ALL SELECT ident, 'rdf:type', 'crm:E_42_Identifier', NULL, NULL FROM p2
    UNION ALL SELECT ident, 'rdfs:label', CAST(id AS VARCHAR), NULL, NULL FROM p2
    UNION ALL SELECT plc, 'crm:P168_place_is_defined_by', space, NULL, NULL FROM p2 WHERE lat IS NOT NULL AND lng IS NOT NULL
    UNION ALL SELECT space, 'rdf:type', 'crm:E94_Space_Primitive', NULL, NULL FROM p2 WHERE lat IS NOT NULL AND lng IS NOT NULL
    UNION ALL SELECT space, 'crm:P168_place_is_defined_by',
                     'Point ( ' || CASE WHEN lng > 0 THEN '+' ELSE '' END || CAST(lng AS VARCHAR)
                     || ' ' || CASE WHEN lat > 0 THEN '+' ELSE '' END || CAST(lat AS VARCHAR) || ' )',
                     NULL, 'geo:wktLiteral' FROM p2 WHERE lat IS NOT NULL AND lng IS NOT NULL
    UNION ALL SELECT plc, 'owl:sameAs', 'http://geo/' || CAST(id AS VARCHAR), NULL, NULL FROM p2
    UNION ALL SELECT plc, 'owl:sameAs', 'http://gn/' || CAST(id AS VARCHAR), NULL, NULL FROM p2 WHERE id % 5 = 0
)
SELECT DISTINCT s, p, o, o_lang, o_datatype FROM triples
"""


@register("render_place_triples", oracle=RENDER_PLACE_SQL, covers=["R10", "F12"])
def q_render_place(spark, sf_dir):
    """R10: place entities -> CIDOC place/appellation/identifier/space-
    primitive triples incl. geo:wktLiteral datatypes
    (get_data_apis_vanilla.py:834-895)."""
    return E.render_place(places_from_tpch(spark, sf_dir))


# --- R8: organizations from supplier ----------------------------------------------


def orgs_from_tpch(spark, sf_dir):
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    year = (F.lit(1800) + k % 150).cast("string")
    year2 = (F.lit(1900) + k % 120).cast("string")
    full = F.concat(year, F.lit("-02-01"))
    full2 = F.concat(year2, F.lit("-11-30"))
    return supplier.select(
        k.cast("long").alias("id"),
        F.col("s_name").alias("name"),
        F.array(F.concat(F.lit("http://org/"), k.cast("string"))).alias("sameAs"),
        F.when(k % 5 != 0, full).alias("start_date"),
        F.when(k % 9 == 0, F.lit("180"))  # len 3 -> gated out (len >= 4)
        .when(k % 5 != 0, F.when(k % 3 == 0, year).otherwise(full)).alias("start_date_written"),
        F.when(k % 7 != 0, full2).alias("end_date"),
        F.when(k % 7 != 0, F.when(k % 11 == 0, year2).otherwise(full2)).alias("end_date_written"),
    )


RENDER_ORG_SQL = """
WITH org AS (
    SELECT CAST(s_suppkey AS BIGINT) AS id, s_name AS name,
           CASE WHEN s_suppkey % 5 <> 0
                THEN CAST(1800 + s_suppkey % 150 AS VARCHAR) || '-02-01' END AS start_date,
           CASE WHEN s_suppkey % 9 = 0 THEN '180'
                WHEN s_suppkey % 5 <> 0 THEN
                    CASE WHEN s_suppkey % 3 = 0 THEN CAST(1800 + s_suppkey % 150 AS VARCHAR)
                         ELSE CAST(1800 + s_suppkey % 150 AS VARCHAR) || '-02-01' END END AS start_date_written,
           CASE WHEN s_suppkey % 7 <> 0
                THEN CAST(1900 + s_suppkey % 120 AS VARCHAR) || '-11-30' END AS end_date,
           CASE WHEN s_suppkey % 7 <> 0 THEN
                CASE WHEN s_suppkey % 11 = 0 THEN CAST(1900 + s_suppkey % 120 AS VARCHAR)
                     ELSE CAST(1900 + s_suppkey % 120 AS VARCHAR) || '-11-30' END END AS end_date_written
    FROM supplier
),
p2 AS (
    SELECT *,
           'idmapis:groupproxy.' || CAST(id AS VARCHAR) AS org_n,
           'idmapis:groupappellation.' || CAST(id AS VARCHAR) AS app,
           'idmapis:groupstart.' || CAST(id AS VARCHAR) AS ev_s,
           'idmapis:groupstart.timespan.' || CAST(id AS VARCHAR) AS sp_s,
           'idmapis:groupend.' || CAST(id AS VARCHAR) AS ev_e,
           'idmapis:groupend.timespan.' || CAST(id AS VARCHAR) AS sp_e,
           start_date_written IS NOT NULL AND length(start_date_written) >= 4 AS gate_s,
           end_date_written IS NOT NULL AND length(end_date_written) >= 4 AS gate_e
    FROM org
),
triples AS (
    SELECT org_n AS s, 'rdf:type' AS p, 'crm:E74_Group' AS o, CAST(NULL AS VARCHAR) AS o_lang FROM p2
    UNION ALL SELECT org_n, 'rdf:type', 'idmcore:Group', NULL FROM p2
    UNION ALL SELECT org_n, 'owl:sameAs', 'https://apis.acdh.oeaw.ac.at/entity/' || CAST(id AS VARCHAR), NULL FROM p2
    UNION ALL SELECT org_n, 'crm:P1_is_identified_by', app, NULL FROM p2
    UNION ALL SELECT app, 'rdfs:label', name, 'de' FROM p2
    UNION ALL SELECT app, 'rdf:type', 'crm:E33_E41_Linguistic_Appellation', NULL FROM p2
    UNION ALL SELECT org_n, 'owl:sameAs', 'http://org/' || CAST(id AS VARCHAR), NULL FROM p2
    -- beginning of existence
    UNION ALL SELECT ev_s, 'rdf:type', 'crm:E63_Beginning_of_Existence', NULL FROM p2 WHERE gate_s
    UNION ALL SELECT ev_s, 'crm:P92_brought_into_existence', org_n, NULL FROM p2 WHERE gate_s
    UNION ALL SELECT ev_s, 'crm:P4_has_time-span', sp_s, NULL FROM p2 WHERE gate_s AND start_date IS NOT NULL
    UNION ALL SELECT sp_s, 'rdf:type', 'crm:E52_Time-Span', NULL FROM p2 WHERE gate_s AND start_date IS NOT NULL
    UNION ALL SELECT sp_s, 'crm:P82a_begin_of_the_begin',
                     CASE WHEN length(start_date_written) = 4 THEN start_date_written || '-01-01T00:00:00'
                          ELSE start_date || 'T00:00:00' END, NULL
              FROM p2 WHERE gate_s AND start_date IS NOT NULL
    UNION ALL SELECT sp_s, 'crm:P81a_end_of_the_begin', start_date_written || '-12-31T23:59:59', NULL
              FROM p2 WHERE gate_s AND start_date IS NOT NULL AND length(start_date_written) = 4
    UNION ALL SELECT sp_s, 'rdfs:label',
                     start_date_written || CASE WHEN end_date_written IS NOT NULL AND length(end_date_written) > 0
                                                THEN ' - ' || end_date_written ELSE '' END, NULL
              FROM p2 WHERE gate_s AND start_date IS NOT NULL
                        AND start_date_written IS NOT NULL AND length(start_date_written) > 0
    -- end of existence
    UNION ALL SELECT ev_e, 'rdf:type', 'crm:E64_End_of_Existence', NULL FROM p2 WHERE gate_e
    UNION ALL SELECT ev_e, 'crm:P93_took_out_of_existence', org_n, NULL FROM p2 WHERE gate_e
    UNION ALL SELECT ev_e, 'crm:P4_has_time-span', sp_e, NULL FROM p2 WHERE gate_e AND end_date IS NOT NULL
    UNION ALL SELECT sp_e, 'rdf:type', 'crm:E52_Time-Span', NULL FROM p2 WHERE gate_e AND end_date IS NOT NULL
    UNION ALL SELECT sp_e, 'crm:P82b_end_of_the_end',
                     CASE WHEN length(end_date_written) = 4 THEN end_date_written || '-12-31T23:59:59'
                          ELSE end_date || 'T23:59:59' END, NULL
              FROM p2 WHERE gate_e AND end_date IS NOT NULL
    UNION ALL SELECT sp_e, 'crm:P81b_begin_of_the_end', end_date_written || '-01-01T00:00:00', NULL
              FROM p2 WHERE gate_e AND end_date IS NOT NULL AND length(end_date_written) = 4
)
SELECT DISTINCT s, p, o, o_lang FROM triples
"""


@register("render_org_triples", oracle=RENDER_ORG_SQL, covers=["R8", "F11"])
def q_render_org(spark, sf_dir):
    """R8: organization entities -> group proxy + begin/end-of-existence
    triples with len>=4 gates (get_data_apis_vanilla.py:699-779)."""
    return E.render_organization(orgs_from_tpch(spark, sf_dir))


# --- R2/R9: person-place relations from orders --------------------------------------


def personplace_rels_from_tpch(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    year = (F.lit(1850) + k % 100).cast("string")
    full = F.concat(year, F.lit("-04-10"))
    return orders.select(
        k.cast("long").alias("id"),
        F.struct(
            F.when(k % 7 == 0, F.lit(595)).when(k % 7 == 1, F.lit(596))
            .otherwise(F.lit(600) + (k % 5)).cast("long").alias("id"),
            F.concat(F.lit("rel_"), (k % 5).cast("string")).alias("label"),
        ).alias("relation_type"),
        F.struct(
            F.col("o_custkey").cast("long").alias("id"),
            F.when(k % 13 != 0, F.concat(F.lit("P"), F.col("o_custkey").cast("string"))).alias("label"),
        ).alias("related_person"),
        F.struct(
            (F.col("o_custkey") % 25).cast("long").alias("id"),
            F.concat(F.lit("PL"), (F.col("o_custkey") % 25).cast("string")).alias("label"),
        ).alias("related_place"),
        F.when(k % 3 != 0, full).alias("start_date"),
        F.when(k % 3 != 0, F.when(k % 4 == 0, year).otherwise(full)).alias("start_date_written"),
        F.when((k % 3 != 0) & (k % 2 == 0), full).alias("end_date"),
        F.when((k % 3 != 0) & (k % 2 == 0), F.when(k % 9 == 0, year).otherwise(full)).alias("end_date_written"),
    )


RENDER_PERSONPLACE_SQL = """
WITH rel AS (
    SELECT CAST(o_orderkey AS BIGINT) AS id,
           CASE WHEN o_orderkey % 7 = 0 THEN 595 WHEN o_orderkey % 7 = 1 THEN 596
                ELSE 600 + (o_orderkey % 5) END AS rt_id,
           'rel_' || CAST(o_orderkey % 5 AS VARCHAR) AS rt_label,
           CAST(o_custkey AS BIGINT) AS person_id,
           CASE WHEN o_orderkey % 13 <> 0 THEN 'P' || CAST(o_custkey AS VARCHAR) END AS person_label,
           CAST(o_custkey % 25 AS BIGINT) AS place_id,
           'PL' || CAST(o_custkey % 25 AS VARCHAR) AS place_label,
           CASE WHEN o_orderkey % 3 <> 0
                THEN CAST(1850 + o_orderkey % 100 AS VARCHAR) || '-04-10' END AS start_date,
           CASE WHEN o_orderkey % 3 <> 0 THEN
                CASE WHEN o_orderkey % 4 = 0 THEN CAST(1850 + o_orderkey % 100 AS VARCHAR)
                     ELSE CAST(1850 + o_orderkey % 100 AS VARCHAR) || '-04-10' END END AS start_date_written,
           CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 2 = 0
                THEN CAST(1850 + o_orderkey % 100 AS VARCHAR) || '-04-10' END AS end_date,
           CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 2 = 0 THEN
                CASE WHEN o_orderkey % 9 = 0 THEN CAST(1850 + o_orderkey % 100 AS VARCHAR)
                     ELSE CAST(1850 + o_orderkey % 100 AS VARCHAR) || '-04-10' END END AS end_date_written
    FROM orders
),
p2 AS (
    SELECT *,
           'idmapis:place.' || CAST(place_id AS VARCHAR) AS place_uri,
           'idmapis:event.personplace.' || CAST(id AS VARCHAR) AS ev,
           'idmapis:personplace.eventrole.' || CAST(id AS VARCHAR) AS role,
           'idmapis:personproxy.' || CAST(person_id AS VARCHAR) AS pers,
           'idmrole:' || CAST(rt_id AS VARCHAR) AS roletype,
           'idmapis:personplace.timespan.' || CAST(id AS VARCHAR) AS span
    FROM rel
),
triples AS (
    SELECT 'idmapis:birthevent.' || CAST(person_id AS VARCHAR) AS s,
           'crm:P7_took_place_at' AS p, place_uri AS o, CAST(NULL AS VARCHAR) AS o_lang
    FROM p2 WHERE rt_id = 595
    UNION ALL SELECT 'idmapis:deathevent.' || CAST(person_id AS VARCHAR),
           'crm:P7_took_place_at', place_uri, NULL FROM p2 WHERE rt_id = 596
    UNION ALL SELECT ev, 'crm:P7_took_place_at', place_uri, NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    -- generic event (R9) for the else branch
    UNION ALL SELECT role, 'bioc:inheres_in', pers, NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT role, 'rdf:type', roletype, NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT roletype, 'rdfs:subClassOf', 'bioc:Event_Role', NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT roletype, 'rdfs:label', rt_label, 'de' FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT ev, 'bioc:had_participant_in_role', role, NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT ev, 'rdf:type', 'crm:E5_Event', NULL FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT role, 'rdfs:label', rt_label, 'de' FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT ev, 'rdfs:label',
           coalesce(person_label, 'None') || ' ' || coalesce(rt_label, 'None') || ' '
           || coalesce(place_label, 'None'), 'de' FROM p2 WHERE rt_id NOT IN (595, 596)
    UNION ALL SELECT ev, 'crm:P4_has_time-span', span, NULL FROM p2
              WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL
    UNION ALL SELECT span, 'rdf:type', 'crm:E52_Time-Span', NULL FROM p2
              WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL
    UNION ALL SELECT span, 'crm:P82a_begin_of_the_begin',
           CASE WHEN length(start_date_written) = 4 THEN start_date_written || '-01-01T00:00:00'
                ELSE start_date || 'T00:00:00' END, NULL
           FROM p2 WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL
    UNION ALL SELECT span, 'crm:P81a_end_of_the_begin', start_date_written || '-12-31T23:59:59', NULL
           FROM p2 WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL AND length(start_date_written) = 4
    UNION ALL SELECT span, 'rdfs:label',
           start_date_written || CASE WHEN end_date_written IS NOT NULL AND length(end_date_written) > 0
                                      THEN ' - ' || end_date_written ELSE '' END, NULL
           FROM p2 WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL
                     AND start_date_written IS NOT NULL AND length(start_date_written) > 0
    UNION ALL SELECT span, 'crm:P82b_end_of_the_end',
           CASE WHEN length(end_date_written) = 4 THEN end_date_written || '-12-31T23:59:59'
                ELSE end_date || 'T23:59:59' END, NULL
           FROM p2 WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL AND end_date IS NOT NULL
    UNION ALL SELECT span, 'crm:P81b_begin_of_the_end', end_date_written || '-01-01T00:00:00', NULL
           FROM p2 WHERE rt_id NOT IN (595, 596) AND start_date IS NOT NULL AND end_date IS NOT NULL
                     AND length(end_date_written) = 4
)
SELECT DISTINCT s, p, o, o_lang FROM triples
"""


@register("render_personplace_triples", oracle=RENDER_PERSONPLACE_SQL,
          covers=["R2", "R9", "J8", "F11"])
def q_render_personplace(spark, sf_dir):
    """R2+R9: person-place relations -> birth/death-place triples or
    generic events with roles and time-spans
    (get_data_apis_vanilla.py:115-162, 782-831)."""
    triples, _worklist = E.render_personplace_relations(
        personplace_rels_from_tpch(spark, sf_dir)
    )
    return triples
