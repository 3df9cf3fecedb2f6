"""Oracle queries for R3 (person-person) and the career chain R6+J8+R7
(person-institution relations with residence propagation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.render import entities as E

# --- R3: person-person relations from orders -----------------------------------


def personperson_rels_from_tpch(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    rt_id = (
        F.when(k % 5 == 0, F.lit(5870))
        .when(k % 5 == 1, F.lit(5414))
        .otherwise(F.lit(9000) + k % 3)
        .cast("long")
    )
    return orders.select(
        k.cast("long").alias("id"),
        F.struct(
            rt_id.alias("id"),
            F.concat(F.lit("pp_"), rt_id.cast("string")).alias("label"),
            F.when(k % 2 == 0, (F.lit(4000) + k % 4).cast("long")).alias("parent_id"),
        ).alias("relation_type"),
        F.struct(
            F.col("o_custkey").cast("long").alias("id"),
            F.concat(F.lit("P"), F.col("o_custkey").cast("string")).alias("label"),
        ).alias("related_person"),
        F.struct(
            ((F.col("o_custkey") * 7) % 1500 + 1).cast("long").alias("id"),
            F.lit(None).cast("string").alias("label"),
        ).alias("related_personB"),
    )


RENDER_PP_SQL = """
WITH rel AS (
    SELECT CAST(o_orderkey AS BIGINT) AS id,
           CASE WHEN o_orderkey % 5 = 0 THEN 5870 WHEN o_orderkey % 5 = 1 THEN 5414
                ELSE 9000 + o_orderkey % 3 END AS rt_id,
           CASE WHEN o_orderkey % 2 = 0 THEN 4000 + o_orderkey % 4 END AS parent_id,
           CAST(o_custkey AS BIGINT) AS pa,
           CAST((o_custkey * 7) % 1500 + 1 AS BIGINT) AS pb
    FROM orders
),
p2 AS (
    SELECT *,
           rt_id IN (5870, 5871, 5741, 5414, 5413, 5412, 5411) AS fam,
           'pp_' || CAST(rt_id AS VARCHAR) AS rt_label,
           'idmapis:personproxy.' || CAST(pa AS VARCHAR) AS pers_a,
           'idmapis:personproxy.' || CAST(pb AS VARCHAR) AS pers_b,
           'idmapis:personrelation.' || CAST(id AS VARCHAR) AS n_rel,
           'idmrelations:' || CAST(rt_id AS VARCHAR) AS n_reltype,
           'idmrelations:' || CAST(parent_id AS VARCHAR) AS n_parent
    FROM rel
),
triples AS (
    SELECT pers_a AS s,
           CASE WHEN fam THEN 'bioc:has_family_relation' ELSE 'bioc:has_person_relation' END AS p,
           n_rel AS o, CAST(NULL AS VARCHAR) AS o_lang
    FROM p2
    UNION ALL SELECT n_rel, 'rdf:type', n_reltype, NULL FROM p2
    UNION ALL SELECT n_rel, 'rdfs:label', rt_label, 'de' FROM p2
    UNION ALL SELECT pers_b, 'bioc:bearer_of', n_rel, NULL FROM p2
    UNION ALL SELECT n_reltype, 'rdfs:subClassOf', n_parent, NULL FROM p2 WHERE parent_id IS NOT NULL
    UNION ALL SELECT n_parent, 'rdfs:subClassOf',
           CASE WHEN fam THEN 'bioc:Family_Relationship_Role' ELSE 'bioc:Person_Relationship_Role' END,
           NULL FROM p2 WHERE parent_id IS NOT NULL
    UNION ALL SELECT n_reltype, 'rdfs:subClassOf',
           CASE WHEN fam THEN 'bioc:Family_Relationship_Role' ELSE 'bioc:Person_Relationship_Role' END,
           NULL FROM p2 WHERE parent_id IS NULL
)
SELECT DISTINCT s, p, o, o_lang FROM triples
"""


@register("render_personperson_triples", oracle=RENDER_PP_SQL, covers=["R3"])
def q_render_personperson(spark, sf_dir):
    """R3: family-vs-person predicate branching + relation-type hierarchy
    (get_data_apis_vanilla.py:165-271)."""
    triples, _ = E.render_personperson_relations(personperson_rels_from_tpch(spark, sf_dir))
    return triples


# --- R6 + J8 + R7: career chain -------------------------------------------------


def career_rels_from_tpch(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    year = (F.lit(1870) + k % 80).cast("string")
    full = F.concat(year, F.lit("-09-01"))
    rt_id = (F.lit(700) + k % 6).cast("long")
    return orders.select(
        k.cast("long").alias("id"),
        F.struct(
            rt_id.alias("id"),
            F.concat(F.lit("career_"), rt_id.cast("string")).alias("label"),
            F.when(k % 2 == 0, (F.lit(800) + k % 3).cast("long")).alias("parent_id"),
        ).alias("relation_type"),
        F.struct(
            F.col("o_custkey").cast("long").alias("id"),
            F.concat(F.lit("P"), F.col("o_custkey").cast("string")).alias("label"),
        ).alias("related_person"),
        F.struct(
            (F.col("o_custkey") % 100).cast("long").alias("id"),
            F.when(k % 17 != 0, F.concat(F.lit("I"), (F.col("o_custkey") % 100).cast("string"))).alias("label"),
        ).alias("related_institution"),
        F.when(k % 3 != 0, full).alias("start_date"),
        F.when(k % 3 != 0, F.when(k % 4 == 0, year).otherwise(full)).alias("start_date_written"),
        F.when(k % 2 == 0, full).alias("end_date"),
        F.when(k % 2 == 0, F.when(k % 9 == 0, year).otherwise(full)).alias("end_date_written"),
    )


def orgplace_rels_from_tpch(spark, sf_dir):
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    return supplier.select(
        k.cast("long").alias("id"),
        F.struct((k % 100).cast("long").alias("id"), F.lit(None).cast("string").alias("label")).alias(
            "related_institution"
        ),
        F.struct(
            F.col("s_nationkey").cast("long").alias("id"), F.lit(None).cast("string").alias("label")
        ).alias("related_place"),
    )


RENDER_CAREER_SQL = """
WITH rel AS (
    SELECT CAST(o_orderkey AS BIGINT) AS id,
           700 + o_orderkey % 6 AS rt_id,
           CASE WHEN o_orderkey % 2 = 0 THEN 800 + o_orderkey % 3 END AS parent_id,
           CAST(o_custkey AS BIGINT) AS person_id,
           'P' || CAST(o_custkey AS VARCHAR) AS person_label,
           CAST(o_custkey % 100 AS BIGINT) AS inst_id,
           CASE WHEN o_orderkey % 17 <> 0 THEN 'I' || CAST(o_custkey % 100 AS VARCHAR) END AS inst_label,
           CASE WHEN o_orderkey % 3 <> 0
                THEN CAST(1870 + o_orderkey % 80 AS VARCHAR) || '-09-01' END AS start_date,
           CASE WHEN o_orderkey % 3 <> 0 THEN
                CASE WHEN o_orderkey % 4 = 0 THEN CAST(1870 + o_orderkey % 80 AS VARCHAR)
                     ELSE CAST(1870 + o_orderkey % 80 AS VARCHAR) || '-09-01' END END AS start_date_written,
           CASE WHEN o_orderkey % 2 = 0
                THEN CAST(1870 + o_orderkey % 80 AS VARCHAR) || '-09-01' END AS end_date,
           CASE WHEN o_orderkey % 2 = 0 THEN
                CASE WHEN o_orderkey % 9 = 0 THEN CAST(1870 + o_orderkey % 80 AS VARCHAR)
                     ELSE CAST(1870 + o_orderkey % 80 AS VARCHAR) || '-09-01' END END AS end_date_written
    FROM orders
),
p2 AS (
    SELECT *,
           'career_' || CAST(rt_id AS VARCHAR) AS rt_label,
           'idmapis:personproxy.' || CAST(person_id AS VARCHAR) AS pers,
           'idmapis:groupproxy.' || CAST(inst_id AS VARCHAR) AS inst,
           'idmapis:grouprelation.' || CAST(id AS VARCHAR) AS n_rel,
           'idmapis:grouprole.' || CAST(rt_id AS VARCHAR) AS grt,
           'idmapis:career.' || CAST(id AS VARCHAR) AS career,
           'idmapis:career.timespan.' || CAST(id AS VARCHAR) AS span,
           'idmapis:personrole.' || CAST(id AS VARCHAR) || '.' || CAST(person_id AS VARCHAR) AS prole,
           'idmapis:personrole.' || CAST(rt_id AS VARCHAR) AS prole_t,
           'idmapis:grouprole.' || CAST(id AS VARCHAR) || '.' || CAST(inst_id AS VARCHAR) AS ginst
    FROM rel
),
residence AS (
    SELECT DISTINCT 'idmapis:groupproxy.' || CAST(s_suppkey % 100 AS VARCHAR) AS org,
           'idmapis:place.' || CAST(s_nationkey AS VARCHAR) AS plc
    FROM supplier
),
triples AS (
    SELECT pers AS s, 'bioc:has_group_relation' AS p, n_rel AS o, CAST(NULL AS VARCHAR) AS o_lang FROM p2
    UNION ALL SELECT n_rel, 'rdf:type', grt, NULL FROM p2
    UNION ALL SELECT grt, 'rdfs:subClassOf', 'idmapis:grouprole.' || CAST(parent_id AS VARCHAR), NULL
              FROM p2 WHERE parent_id IS NOT NULL
    UNION ALL SELECT n_rel, 'rdfs:label', rt_label, 'de' FROM p2
    UNION ALL SELECT n_rel, 'bioc:inheres_in', inst, NULL FROM p2
    UNION ALL SELECT career, 'rdf:type', 'idmcore:Career', NULL FROM p2
    UNION ALL SELECT 'idmcore:Career', 'rdfs:subClassOf', 'crm:E5_Event', NULL FROM p2
    UNION ALL SELECT career, 'rdfs:label',
           coalesce(person_label, 'None') || ' ' || coalesce(rt_label, 'None') || ' '
           || coalesce(inst_label, 'None'), 'de' FROM p2
    UNION ALL SELECT career, 'bioc:had_participant_in_role', prole, NULL FROM p2
    UNION ALL SELECT pers, 'bioc:bearer_of', prole, NULL FROM p2
    UNION ALL SELECT prole, 'rdf:type', prole_t, NULL FROM p2
    UNION ALL SELECT prole_t, 'rdf:type', 'idmapis:personrole.' || CAST(parent_id AS VARCHAR), NULL
              FROM p2 WHERE parent_id IS NOT NULL
    UNION ALL SELECT career, 'bioc:had_participant_in_role', ginst, NULL FROM p2
    UNION ALL SELECT ginst, 'rdf:type', 'bioc:Group_Relationship_Role', NULL FROM p2
    UNION ALL SELECT ginst, 'bioc:inheres_in', inst, NULL FROM p2
    UNION ALL SELECT career, 'crm:P4_has_time-span', span, NULL FROM p2
              WHERE start_date IS NOT NULL OR end_date IS NOT NULL
    -- start bounds
    UNION ALL SELECT span, 'crm:P82a_begin_of_the_begin',
           CASE WHEN length(start_date_written) = 4 THEN start_date_written || '-01-01T00:00:00'
                ELSE start_date || 'T00:00:00' END, NULL FROM p2 WHERE start_date IS NOT NULL
    UNION ALL SELECT span, 'crm:P81a_end_of_the_begin', start_date_written || '-12-31T23:59:59', NULL
           FROM p2 WHERE start_date IS NOT NULL AND length(start_date_written) = 4
    UNION ALL SELECT span, 'rdfs:label',
           start_date_written || CASE WHEN end_date_written IS NOT NULL AND length(end_date_written) > 0
                                      THEN ' - ' || end_date_written ELSE '' END, NULL
           FROM p2 WHERE start_date IS NOT NULL AND start_date_written IS NOT NULL
                     AND length(start_date_written) > 0
    UNION ALL SELECT span, 'rdf:type', 'crm:E52_Time-Span', NULL FROM p2 WHERE start_date IS NOT NULL
    -- end bounds
    UNION ALL SELECT span, 'crm:P82b_end_of_the_end',
           CASE WHEN length(end_date_written) = 4 THEN end_date_written || '-12-31T23:59:59'
                ELSE end_date || 'T23:59:59' END, NULL FROM p2 WHERE end_date IS NOT NULL
    UNION ALL SELECT span, 'crm:P81b_begin_of_the_end', end_date_written || '-01-01T00:00:00', NULL
           FROM p2 WHERE end_date IS NOT NULL AND length(end_date_written) = 4
    UNION ALL SELECT span, 'rdf:type', 'crm:E52_Time-Span', NULL FROM p2 WHERE end_date IS NOT NULL
    -- J8: propagate institution residences onto the career
    UNION ALL SELECT p2.career, 'crm:P7_took_place_at', r.plc, NULL
              FROM p2 JOIN residence r ON p2.inst = r.org
    -- R7: the residence triples themselves
    UNION ALL SELECT org, 'crm:P74_has_current_or_former_residence', plc, NULL FROM residence
)
SELECT DISTINCT s, p, o, o_lang FROM triples
"""


@register("render_career_triples", oracle=RENDER_CAREER_SQL,
          covers=["R6", "R7", "J8", "F11"])
def q_render_career(spark, sf_dir):
    """R6+R7+J8: career events with roles on both sides, time-spans, and
    residence propagation from the institutions' R7 triples
    (get_data_apis_vanilla.py:352-510, 677-696, J8 at :481-485)."""
    res_triples, _places = E.render_organizationplace_relations(
        orgplace_rels_from_tpch(spark, sf_dir)
    )
    career_triples, _insts = E.render_personinstitution_relations(
        career_rels_from_tpch(spark, sf_dir), residence_triples=res_triples
    )
    return career_triples.unionByName(res_triples).distinct()


# --- R4/R5: role vocabulary ------------------------------------------------------


def roles_from_tpch(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    return part.select(
        k.cast("long").alias("id"),
        F.concat(F.lit("role_"), k.cast("string")).alias("label"),
        F.when(k % 3 == 0, (k % 50).cast("long")).alias("parent_id"),
    )


RENDER_ROLE_SQL = """
WITH role AS (
    SELECT CAST(p_partkey AS BIGINT) AS id,
           'role_' || CAST(p_partkey AS VARCHAR) AS label,
           CASE WHEN p_partkey % 3 = 0 THEN CAST(p_partkey % 50 AS BIGINT) END AS parent_id
    FROM part
),
triples AS (
    SELECT 'idmapis:personrole.' || CAST(id AS VARCHAR) AS s, 'rdfs:label' AS p,
           label AS o, 'de' AS o_lang FROM role
    UNION ALL
    SELECT 'idmapis:personrole.' || CAST(id AS VARCHAR), 'rdf:type', 'bioc:Actor_Role', NULL
    FROM role WHERE parent_id IS NULL
)
SELECT DISTINCT s, p, o, o_lang FROM triples
"""


@register("render_personrole_triples", oracle=RENDER_ROLE_SQL, covers=["R4", "R5", "J7"])
def q_render_roles(spark, sf_dir):
    """R4/R5: role vocabulary labels + Actor_Role typing; the parent
    worklist is the J7 anti-join second-round feed
    (get_data_apis_vanilla.py:274-349)."""
    triples, _parents = E.render_personroles(roles_from_tpch(spark, sf_dir))
    return triples
