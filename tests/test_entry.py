"""Smoke tests for the driver contract."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"id", "label", "name"} <= set(df.columns)


def test_catalog_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_flagship_labels(spark, sf_dir):
    df = entry_mod.queries()["person_index_docs"](spark, sf_dir)
    row = df.filter(df.date_of_birth.isNotNull() & df.date_of_death.isNotNull()).first()
    assert row is not None
    # label = "name (YYYY - YYYY): description"-shaped
    assert row.label.startswith(row.name + " (")
    assert row.id.startswith("http://www.wikidata.org/entity/Q")
