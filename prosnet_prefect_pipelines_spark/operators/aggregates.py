"""Aggregation operators (SURVEY §2.4).

SPARQL GROUP_CONCAT with the reference's default single-space separator —
downstream code splits on whitespace (wikidata_index.py:111), so the
separator is load-bearing. ``sort_array`` makes the output deterministic
(SPARQL leaves element order undefined; a distributed engine must pick).

Scale: collect_list/collect_set are hash aggregations with partial
(map-side) combine from Catalyst; memory is bounded by per-group payload,
not group count. Skewed groups -> AQE skew handling; truly huge groups
would need a sketch/truncation variant, which the reference never has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_concat(col: str | Column, separator: str = " ") -> Column:
    """GROUP_CONCAT(?x) — bag semantics, deterministic sorted order (A3).

    Reference: (group_concat(?GN_FeatureCode) as ?feature_code),
    sparql/wikidata-city.sparql:1,25.
    """
    return F.array_join(F.sort_array(F.collect_list(col)), separator)


def group_concat_distinct(col: str | Column, separator: str = " ") -> Column:
    """GROUP_CONCAT(DISTINCT ?x) (A4 — wikidata-organization.sparql:1,38)."""
    return F.array_join(F.sort_array(F.collect_set(col)), separator)


def count_distinct_paginator(df: DataFrame, col: str) -> DataFrame:
    """The reference's derived COUNT(DISTINCT ?item) sizing query (A1).

    Generated at wikidata_index.py:173-179, executed :148-151 to size the
    pagination loop. At 100 TB prefer approx_count_distinct for sizing —
    exact kept here because the oracle checks exact values.
    """
    return df.agg(F.countDistinct(col).alias("count"))
