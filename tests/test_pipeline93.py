"""Unit tests for batch-93: calendar & behavior profiles."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_month_end_covers_all_orders(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline93 import (
        q_month_end_effect,
    )

    rows = {r.month_end: r for r in q_month_end_effect(spark, SF).collect()}
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows.values()) == n_orders
    assert set(rows) == {0, 1}
    # the last-3-days window is the small minority of any month
    assert rows[1].n_orders < rows[0].n_orders


def test_business_hours_bounds(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline93 import (
        q_business_hours_share,
    )

    rows = q_business_hours_share(spark, SF).collect()
    for r in rows:
        assert 0 <= r.n_business_hours <= r.n
        assert r.business_share_ppm == r.n_business_hours * 1_000_000 // r.n
        # 8 of 24 hours: uniform traffic sits near 333k ppm
        assert 0 < r.business_share_ppm < 1_000_000


def test_burstiness_positive(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline93 import (
        q_user_burstiness,
    )

    rows = q_user_burstiness(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_active_hours >= 2
        assert r.n_events >= r.n_active_hours
        assert r.dispersion_ppm >= 0


def test_lifespan_partitions_customers(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline93 import (
        q_customer_lifespan_histogram,
    )

    rows = q_customer_lifespan_histogram(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert r.half_year_bucket * 180 <= r.min_days <= r.max_days
        assert r.max_days < (r.half_year_bucket + 1) * 180


def test_bag_diff_multiset_semantics(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline93 import (
        q_bag_diff_report,
    )

    out = {r.side: r for r in q_bag_diff_report(spark, SF).collect()}
    assert set(out) == {"only_in_a", "only_in_b"}
    # residual row counts equal the sample-size difference per side:
    # |A| - |A ∩bag B| and |B| - |A ∩bag B| — verify the coarse identity
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    na = cust.filter(F.col("c_custkey") % 3 != 0).count()
    nb = cust.filter(F.col("c_custkey") % 5 != 0).count()
    assert out["only_in_a"].n_rows - out["only_in_b"].n_rows == na - nb
