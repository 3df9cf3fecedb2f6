"""S1/S2: SPARQL JSON result bindings -> typed DataFrame.

The reference consumes ``sparql_data["results"]["bindings"]`` — rows of
``var -> {type, value, xml:lang?, datatype?}`` where OPTIONAL variables
are absent per row (wikidata_index.py:189-203). Here the envelope parses
with an explicit schema (map of var -> value struct); absent binding
becomes NULL; the typed value struct flattens to a plain string column
(SURVEY §1 model #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALUE_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("xml:lang", T.StringType()),
        T.StructField("datatype", T.StringType()),
    ]
)


def bindings_schema(variables: list[str]) -> T.StructType:
    return T.StructType([T.StructField(v, VALUE_STRUCT, True) for v in variables])


def parse_bindings_json(
    spark: SparkSession, json_lines: DataFrame, variables: list[str], text_col: str = "value"
) -> DataFrame:
    """json_lines: one SPARQL-JSON *binding row* per record (the envelope's
    results.bindings[] already fanned out by the fetch layer).

    -> one nullable string column per variable; language tags/datatypes
    available as ``<var>__lang`` / ``<var>__datatype`` for F13 filters.
    """
    parsed = json_lines.select(
        F.from_json(F.col(text_col), bindings_schema(variables)).alias("b")
    )
    cols = []
    for v in variables:
        cols.append(F.col(f"b.{v}.value").alias(v))
        cols.append(F.col(f"b.{v}.`xml:lang`").alias(f"{v}__lang"))
        cols.append(F.col(f"b.{v}.datatype").alias(f"{v}__datatype"))
    return parsed.select(*cols)


def fan_out_envelope(spark: SparkSession, envelope_df: DataFrame, text_col: str = "value") -> DataFrame:
    """Split full SPARQL-JSON envelopes into one JSON string per binding row."""
    schema = T.StructType(
        [
            T.StructField(
                "results",
                T.StructType([T.StructField("bindings", T.ArrayType(T.StringType()))]),
            )
        ]
    )
    # bindings kept as raw JSON strings (schema_of_json per row varies);
    # use get_json_object-style extraction via from_json on the envelope
    parsed = envelope_df.select(
        F.explode(
            F.from_json(F.col(text_col), "STRUCT<results: STRUCT<bindings: ARRAY<STRING>>>")
            .getField("results")
            .getField("bindings")
        ).alias("value")
    )
    return parsed
