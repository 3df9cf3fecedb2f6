"""Unit tests for batch-52: secret scan, license detection."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_secret_scan_flags_injected_keys_only(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline52 import q_secret_scan

    rows = {r.doc_id: r for r in q_secret_scan(spark, SF).collect()}
    assert rows
    for doc_id, r in rows.items():
        if doc_id % 7 == 0:
            # the injected fake key must be caught
            assert r.has_secret and r.n_secrets >= 1
        else:
            # natural vocabulary words are short and vowel-rich
            assert not r.has_secret and r.n_secrets == 0


def test_license_detect_partition_and_priority(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline52 import q_license_detect

    rows = {r.license: r for r in q_license_detect(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows.values()) == n
    assert set(rows) == {"mit", "apache-2.0", "gpl-3.0", "unknown"}
    # priority: doc 0 matches %11, %13 and %17 — the injector appends
    # the FIRST matching branch (mit), so doc 0 counts as mit
    assert rows["mit"].first_doc == 0
    for lic, r in rows.items():
        assert r.n_docs > 0
