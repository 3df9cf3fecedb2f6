"""S8: GeoNames TSV scan + place-document pipeline.

Reference: prosnet-prefect-pipelines/geonames_place_index.py — download
zip, csv.DictReader over 19 positional tab-separated columns (:13-25),
project 6 of them into a Typesense doc with computed id/label and float
casts (:33-43), JSON sink (:44-53).

Engine shape: the zip is staged once (driver-side; out-of-engine like the
reference's download task), then ``spark.read.csv`` with the explicit
19-column schema — no inference, predicate/column pruning reach the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.functions import scalar
from prosnet_prefect_pipelines_spark.model import GEONAMES_SCHEMA


def read_geonames_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Tab-separated, headerless, explicit schema (geonames_place_index.py:85-107)."""
    return spark.read.csv(path, sep="\t", header=False, schema=GEONAMES_SCHEMA)


def build_place_docs(geonames: DataFrame) -> DataFrame:
    """P2: 19 columns -> search doc (id URI, label, geopoint [lat, lng]).

    Mirrors geonames_place_index.py:33-43: F9 id URI, F8 label,
    lat/lng double casts in [lat, lng] order.
    """
    return geonames.select(
        scalar.geonames_id_uri(F.col("id")).alias("id"),
        scalar.geonames_label(F.col("name"), F.col("country_code"), F.col("feature_code")).alias("label"),
        F.col("name").alias("name"),
        F.col("country_code").alias("country"),
        F.col("feature_code").alias("feature_code"),
        F.array(F.col("latitude").cast("double"), F.col("longitude").cast("double")).alias(
            "coordinates"
        ),
    )
