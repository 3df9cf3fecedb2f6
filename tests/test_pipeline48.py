"""Unit tests for batch-48: WAP gate, diff-in-diff."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_wap_gate_structure_and_verdict(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline48 import q_wap_publish_gate

    rows = {r.rule: r.n_violations for r in q_wap_publish_gate(spark, SF).collect()}
    expected_rules = {
        "rows_min",
        "o_orderkey_not_null",
        "o_orderkey_unique",
        "o_totalprice_positive",
        "o_orderstatus_domain",
        "PUBLISH_GO",
    }
    assert set(rows) == expected_rules
    rule_sum = sum(v for k, v in rows.items() if k != "PUBLISH_GO")
    assert rows["PUBLISH_GO"] == (0 if rule_sum == 0 else 1)
    # healthy synthetic feed: all contracts hold and publish is GO
    assert rows["PUBLISH_GO"] == 0


def test_wap_gate_blocks_bad_data(spark):
    """A corrupted staging slice must flip the verdict."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline48 import q_wap_publish_gate

    bad_dir = tempfile.mkdtemp()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # corrupt: duplicate keys and a negative price
    bad = orders.unionAll(orders.limit(5)).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(-1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    bad.write.mode("overwrite").parquet(f"{bad_dir}/orders.parquet")
    rows = {r.rule: r.n_violations for r in q_wap_publish_gate(spark, bad_dir).collect()}
    assert rows["o_orderkey_unique"] > 0
    assert rows["o_totalprice_positive"] > 0
    assert rows["PUBLISH_GO"] == 1  # NO-GO


def test_did_identity(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline48 import q_diff_in_diff_report

    rows = q_diff_in_diff_report(spark, SF).collect()
    assert len(rows) == 4
    cells = {(r.treated, r.post): r for r in rows}
    assert set(cells) == {(True, True), (True, False), (False, True), (False, False)}
    did = (
        (cells[(True, True)].rate_ppm - cells[(True, False)].rate_ppm)
        - (cells[(False, True)].rate_ppm - cells[(False, False)].rate_ppm)
    )
    for r in rows:
        assert r.did_ppm == did
        assert r.rate_ppm == r.n_purch * 1_000_000 // r.n_events
