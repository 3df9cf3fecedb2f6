"""Flagship pipeline: SPARQL-bindings -> search documents (SURVEY §3.1).

Spark shape of the reference's ``create_typesense_index_from_sparql_query``
(prosnet-prefect-pipelines/wikidata_index.py:281-331, registered 3× in
prefect.yaml:98,172,232): bindings DataFrame -> field mapping (P1) ->
postprocessor registry (P4: F1/F2/F6/F7) -> id canonicalization (P3) ->
label creation (P5: F3/F4/F5) -> flat document DataFrame. The reference's
offset-pagination loop (wikidata_index.py:291-319) disappears — partitions
replace pagination.

For the driver's correctness gate the bindings table is derived
deterministically from the TPC-H-ish customer/orders tables (twin SQL in
``BINDINGS_PERSON_CTE`` so DuckDB builds the identical input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.functions import scalar

# DuckDB twin of bindings_person_from_tpch() — keep in lockstep.
BINDINGS_PERSON_CTE = """
bindings_person AS (
    SELECT
        'http://www.wikidata.org/entity/Q' || CAST(c_custkey AS VARCHAR) AS id,
        c_name AS itemLabel,
        CASE WHEN c_custkey % 20 = 0
             THEN 'http://www.wikidata.org/.well-known/genid/' || CAST(c_custkey AS VARCHAR)
             ELSE strftime(o.min_d, '%Y-%m-%dT%H:%M:%SZ') END AS date_of_birth,
        CASE WHEN o.n_dates >= 2 THEN strftime(o.max_d, '%Y-%m-%dT%H:%M:%SZ') END AS date_of_death,
        CASE WHEN c_acctbal >= 0 THEN c_mktsegment END AS description,
        CASE WHEN c_custkey % 4 <> 0 THEN n.n_name END AS place_of_birthLabel,
        CASE WHEN o.n_dates >= 2 AND c_custkey % 5 <> 0 THEN n.n_name END AS place_of_deathLabel
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (
        SELECT o_custkey,
               min(o_orderdate) AS min_d,
               max(o_orderdate) AS max_d,
               count(DISTINCT o_orderdate) AS n_dates
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
)
"""


def bindings_person_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person-query bindings (FIXTURES.md A2) derived from customer/orders.

    NULL column = unbound OPTIONAL variable; ``http…`` birth dates model
    Wikidata's unknown-value sentinel nodes (wikidata_index.py:16).
    """
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
        F.countDistinct("o_orderdate").alias("n_dates"),
    )
    iso = lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")  # noqa: E731
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            F.concat(F.lit("http://www.wikidata.org/entity/Q"), F.col("c_custkey").cast("string")).alias("id"),
            F.col("c_name").alias("itemLabel"),
            F.when(
                F.col("c_custkey") % 20 == 0,
                F.concat(
                    F.lit("http://www.wikidata.org/.well-known/genid/"),
                    F.col("c_custkey").cast("string"),
                ),
            )
            .otherwise(iso(F.col("min_d")))
            .alias("date_of_birth"),
            F.when(F.col("n_dates") >= 2, iso(F.col("max_d"))).alias("date_of_death"),
            F.when(F.col("c_acctbal") >= 0, F.col("c_mktsegment")).alias("description"),
            F.when(F.col("c_custkey") % 4 != 0, F.col("n_name")).alias("place_of_birthLabel"),
            F.when(
                (F.col("n_dates") >= 2) & (F.col("c_custkey") % 5 != 0), F.col("n_name")
            ).alias("place_of_deathLabel"),
        )
    )


def build_person_docs(bindings: DataFrame) -> DataFrame:
    """P1 rename -> P4 postprocess -> P3 id canon -> P5 label -> doc DF.

    Mirrors wikidata_index.py:183-207 with the person-index preset
    (wikidata_person_index.py:29-38: field_mapping itemLabel->name +
    place_of_birthLabel/place_of_deathLabel->place_of_birth/place_of_death,
    date postprocessing, person label creator).
    """
    # P1: field mapping (wikidata_person_index.py:29-33)
    df = (
        bindings.withColumnRenamed("itemLabel", "name")
        .withColumnRenamed("place_of_birthLabel", "place_of_birth")
        .withColumnRenamed("place_of_deathLabel", "place_of_death")
    )
    # presence of the raw binding (needed for F3's parens rule)
    df = df.withColumn("_dob_bound", F.col("date_of_birth").isNotNull()).withColumn(
        "_dod_bound", F.col("date_of_death").isNotNull()
    )
    # P4: postprocessor registry (prefect.yaml:208-210)
    df = scalar.apply_postprocessing(
        df,
        {"date_of_birth": "date_postprocessing", "date_of_death": "date_postprocessing"},
    )
    # P3: id canonicalization (wikidata_index.py:199-201)
    df = df.withColumn("id", scalar.wikidata_id_rebuild(F.col("id")))
    # P5: label creation (wikidata_index.py:204-205)
    df = df.withColumn(
        "label",
        scalar.label_creator_person(
            F.col("name"),
            F.col("date_of_birth"),
            F.col("date_of_death"),
            F.col("description"),
            dob_bound=F.col("_dob_bound"),
            dod_bound=F.col("_dod_bound"),
        ),
    )
    return df.select(
        "id", "label", "name", "date_of_birth", "date_of_death", "description",
        "place_of_birth", "place_of_death",
    )


def person_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: full bindings->docs pipeline over TPC-H-derived input."""
    return build_person_docs(bindings_person_from_tpch(spark, sf_dir))


# Oracle twin of build_person_docs(): F1 + P3 + F3 in ANSI SQL.
PERSON_INDEX_SQL = f"""
WITH {BINDINGS_PERSON_CTE},
postproc AS (
    SELECT
        'http://www.wikidata.org/entity/' || regexp_extract(id, '([^/]+)$', 1) AS id,
        itemLabel AS name,
        -- NB duckdb split_part(NULL,..) returns '' not NULL -> guard IS NULL
        CASE WHEN date_of_birth IS NULL OR date_of_birth LIKE 'http%' THEN NULL
             ELSE split_part(date_of_birth, 'T', 1) END AS date_of_birth,
        CASE WHEN date_of_death IS NULL OR date_of_death LIKE 'http%' THEN NULL
             ELSE split_part(date_of_death, 'T', 1) END AS date_of_death,
        description,
        place_of_birthLabel AS place_of_birth,
        place_of_deathLabel AS place_of_death,
        date_of_birth IS NOT NULL AS dob_bound,
        date_of_death IS NOT NULL AS dod_bound
    FROM bindings_person
)
SELECT id,
       name
       || CASE WHEN dob_bound OR dod_bound THEN
              ' (' || coalesce(split_part(date_of_birth, '-', 1), '')
                   || CASE WHEN date_of_death IS NOT NULL
                           THEN ' - ' || split_part(date_of_death, '-', 1) ELSE '' END
                   || ')'
          ELSE '' END
       || CASE WHEN description IS NOT NULL THEN ': ' || description ELSE '' END AS label,
       name, date_of_birth, date_of_death, description,
       place_of_birth, place_of_death
FROM postproc
"""
