"""Flagship queries: the person-index pipeline and the headline aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans import person_index
from prosnet_prefect_pipelines_spark.plans.catalog import register


@register("person_index_docs", oracle=person_index.PERSON_INDEX_SQL,
          covers=["P1", "P3", "P4", "P5", "F1", "F3", "J2", "A1"])
def q_person_index_docs(spark, sf_dir):
    """Flagship: SPARQL-bindings -> Typesense-doc pipeline (SURVEY §3.1)."""
    return person_index.person_index_docs(spark, sf_dir)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l_discount AS DECIMAL(12,2))) *
                (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=PRICING_SUMMARY_SQL, covers=["A1", "A2", "F16"])
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style groupBy aggregate — the headline relational plan.

    Aggregation over DECIMAL so the result is exact and order-independent
    (doubles would differ between engines by summation order); final cast
    to DOUBLE. Partial aggregation (map-side combine) comes from Catalyst.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
