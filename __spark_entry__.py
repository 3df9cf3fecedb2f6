"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``prosnet_prefect_pipelines_spark`` (see SURVEY.md
§2 for the operator inventory each query covers; COVERAGE.md maps query
name -> operator ids).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prosnet_prefect_pipelines_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the person-index pipeline (SURVEY §3.1): SPARQL-bindings-shaped
    input -> field mapping -> postprocessor registry -> id canonicalization
    -> label creation -> search-document DataFrame.
    """
    queries, _ = catalog.load()
    return queries["person_index_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = catalog.load()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for non-SQL ops)."""
    _, o = catalog.load()
    return o
