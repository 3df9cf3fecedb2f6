"""Canonical schemas for the engine's five data abstractions (SURVEY §1).

The reference is row-oriented Python (dicts, rdflib triples, csv rows);
here every abstraction is a fixed, all-nullable-where-dynamic StructType
so Catalyst can prune/push down and plans stay columnar.

Reference shapes:
- triples/quads: rdflib Graph/Dataset usage at
  pfp-prefect-pipelines/get_data_from_apis_instance.py:79-94 and the
  pyoxigraph Store at pfp-prefect-pipelines/enrich_via_sparql.py:26
- SPARQL bindings: prosnet-prefect-pipelines/wikidata_index.py:189-203
- search documents: prosnet-prefect-pipelines/geonames_place_index.py:33-43
  and prefect.yaml:102-120 collection definitions
- GeoNames TSV: prosnet-prefect-pipelines/geonames_place_index.py:85-107
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- 1. RDF triples / quads ------------------------------------------------
# One canonical table for every graph the reference holds in rdflib /
# pyoxigraph. Graph algebra (BGP joins, OPTIONAL, property paths, sameAs
# resolution) is expressed as DataFrame ops over this shape.
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), False),  # subject URI
        T.StructField("p", T.StringType(), False),  # predicate URI
        T.StructField("o", T.StringType(), False),  # object URI or literal lexical form
        T.StructField("o_lang", T.StringType(), True),  # language tag (de/en/None)
        T.StructField("o_datatype", T.StringType(), True),  # e.g. xsd:dateTime, geo:wktLiteral
        T.StructField("g", T.StringType(), True),  # named-graph URI, None = default graph
    ]
)

# --- 2. SPARQL SELECT bindings (flattened) ----------------------------------
# The reference consumes results.bindings rows where variables may be
# absent per row (OPTIONAL semantics) — here: fixed nullable columns.
BINDINGS_PERSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("itemLabel", T.StringType(), True),
        T.StructField("date_of_birth", T.StringType(), True),
        T.StructField("date_of_death", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)

BINDINGS_CITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("itemLabel", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("countryLabel", T.StringType(), True),
        T.StructField("feature_code", T.StringType(), True),  # space-concatenated X.CODE values
        T.StructField("coord", T.StringType(), True),  # WKT Point
    ]
)

# --- 3. Flat search documents (Typesense-shaped) -----------------------------
# geopoint is [lat, lng] (note reference swaps WKT long/lat order,
# wikidata_index.py:72-76).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("date_of_birth", T.StringType(), True),
        T.StructField("date_of_death", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("feature_code", T.StringType(), True),
        T.StructField("coordinates", T.ArrayType(T.DoubleType()), True),
    ]
)

# --- 4. GeoNames TSV: 19 fixed positional columns, no header ----------------
# Column list mirrors geonames_place_index.py:85-107.
GEONAMES_COLUMNS = [
    ("id", T.StringType()),
    ("name", T.StringType()),
    ("asciiname", T.StringType()),
    ("alternatenames", T.StringType()),
    ("latitude", T.DoubleType()),
    ("longitude", T.DoubleType()),
    ("feature_class", T.StringType()),
    ("feature_code", T.StringType()),
    ("country_code", T.StringType()),
    ("cc2", T.StringType()),
    ("admin1_code", T.StringType()),
    ("admin2_code", T.StringType()),
    ("admin3_code", T.StringType()),
    ("admin4_code", T.StringType()),
    ("population", T.LongType()),
    ("elevation", T.StringType()),
    ("dem", T.StringType()),
    ("timezone", T.StringType()),
    ("modification_date", T.StringType()),
]

GEONAMES_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in GEONAMES_COLUMNS])

# --- 5. REST JSON entities (APIS) --------------------------------------------
# Nested person entity consumed at get_data_apis_vanilla.py:514-674.
PROFESSION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("parent_id", T.LongType(), True),
    ]
)

APIS_PERSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("start_date", T.StringType(), True),
        T.StructField("end_date", T.StringType(), True),
        T.StructField("start_date_written", T.StringType(), True),
        T.StructField("end_date_written", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("profession", T.ArrayType(PROFESSION_SCHEMA), True),
        T.StructField("sameAs", T.ArrayType(T.StringType()), True),
        T.StructField("text", T.ArrayType(T.StructType([T.StructField("url", T.StringType())])), True),
    ]
)

RELATION_TYPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("parent_id", T.LongType(), True),
    ]
)

RELATED_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("label", T.StringType(), True),
    ]
)

APIS_RELATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("relation_type", RELATION_TYPE_SCHEMA, True),
        T.StructField("related_person", RELATED_ENTITY_SCHEMA, True),
        T.StructField("related_personB", RELATED_ENTITY_SCHEMA, True),
        T.StructField("related_place", RELATED_ENTITY_SCHEMA, True),
        T.StructField("related_institution", RELATED_ENTITY_SCHEMA, True),
        T.StructField("start_date", T.StringType(), True),
        T.StructField("end_date", T.StringType(), True),
        T.StructField("start_date_written", T.StringType(), True),
        T.StructField("end_date_written", T.StringType(), True),
    ]
)

# TPC-H-ish driver tables (TESTDATA.md) — names only; schemas live in parquet.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark, sf_dir: str, names=None):
    """Load driver parquet tables as a dict of DataFrames."""
    names = names or TESTDATA_TABLES
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def read_events(spark, sf_dir: str):
    """events table with exact integer-nanosecond time column ``ts_ns``.

    Handles both physical schemas the driver has shipped: TIMESTAMP(NANOS)
    (arrives as int64 nanos under ``spark.sql.legacy.parquet.nanosAsLong``)
    and TIMESTAMP(MICROS) (arrives as timestamp/timestamp_ntz). Keeping
    event time as epoch integers makes window arithmetic exact and
    engine-independent (DuckDB twin: ``epoch_ns(ts)``); convert with
    ``timestamp_micros(ts_us)`` only at the presentation edge.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        # nanos-as-long path: ts_us via exact integer division (expr div) —
        # going through double loses precision at 1.7e18. DuckDB's parquet
        # reader truncates ns->us the same way (its TIMESTAMP is micros).
        return (
            df.withColumn("ts_ns", F.col("ts").cast("long"))
            .withColumn("ts_us", F.expr("ts div 1000").cast("long"))
            .drop("ts")
        )
    # micros path: NTZ cast to LTZ under the pinned UTC session timezone is
    # identity on the wall-clock value, so unix_micros == DuckDB epoch_us.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        df.withColumn("ts_ns", ts_us * F.lit(1000))
        .withColumn("ts_us", ts_us)
        .drop("ts")
    )


def register_views(spark, sf_dir: str, names=None) -> None:
    """Register driver parquet tables as temp views (same names DuckDB uses)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
