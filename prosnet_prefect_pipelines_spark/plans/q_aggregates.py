"""Aggregation queries (SURVEY §2.4): GROUP_CONCAT family + counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import aggregates as A
from prosnet_prefect_pipelines_spark.plans.catalog import register

# SPARQL default separator is a single space — downstream splits on
# whitespace (wikidata_index.py:111), so it is observable behavior.

GROUP_CONCAT_SQL = """
SELECT c_nationkey,
       string_agg(c_mktsegment, ' ' ORDER BY c_mktsegment) AS segments,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
GROUP BY c_nationkey
"""


@register("group_concat", oracle=GROUP_CONCAT_SQL, covers=["A3"])
def q_group_concat(spark, sf_dir):
    """GROUP_CONCAT bag semantics with deterministic sorted element order
    (wikidata-city.sparql:1,25)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return customer.groupBy("c_nationkey").agg(
        A.group_concat("c_mktsegment").alias("segments"),
        F.count(F.lit(1)).alias("n"),
    )


GROUP_CONCAT_DISTINCT_SQL = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ' ' ORDER BY c_mktsegment) AS segments
FROM customer
GROUP BY c_nationkey
"""


@register("group_concat_distinct", oracle=GROUP_CONCAT_DISTINCT_SQL, covers=["A4"])
def q_group_concat_distinct(spark, sf_dir):
    """GROUP_CONCAT(DISTINCT ...) (wikidata-organization.sparql:1,38)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return customer.groupBy("c_nationkey").agg(
        A.group_concat_distinct("c_mktsegment").alias("segments")
    )


COUNT_DISTINCT_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register("count_distinct", oracle=COUNT_DISTINCT_SQL, covers=["A1", "A2", "A5", "A6"])
def q_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT ?item) — the reference's derived sizing query
    (wikidata_index.py:173-179). Exact here; approx_count_distinct is the
    100 TB sizing path."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SALTED_AGG_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("salted_aggregate_skew", oracle=SALTED_AGG_SQL, covers=["A2"])
def q_salted_aggregate_skew(spark, sf_dir):
    """Two-phase salted aggregation over a LOW-CARDINALITY key (3
    returnflag values across the whole fact table — the hot-key shape
    AQE can't split because every row of a key hashes to one reducer):
    phase 1 pre-aggregates on (key, salt) across 16 buckets, phase 2
    combines |keys| x 16 partial rows. Decimal sums keep the result
    bit-identical to the unsalted oracle under any partitioning."""
    from prosnet_prefect_pipelines_spark.operators.aggregates import salted_aggregate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": ("count", F.lit(1)),
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(18,2)")),
        },
        salt_buckets=16,
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag", "n", F.col("sum_qty").cast("double").alias("sum_qty")
    )


QUANTILES_SQL = """
WITH n AS (SELECT event_type, COUNT(*) AS _n FROM events GROUP BY event_type),
r AS (
    SELECT event_type, value,
           row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS rn
    FROM events
),
p AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS p)
SELECT r.event_type, p.p, r.value AS quantile
FROM r JOIN n USING (event_type)
JOIN p ON r.rn = CAST(ceil(p.p * n._n) AS BIGINT)
"""


@register("value_quantiles", oracle=QUANTILES_SQL, covers=["A2", "O1"])
def q_value_quantiles(spark, sf_dir):
    """Exact nearest-rank quantiles of event value per event type
    (p25/p50/p75/p90/p99) — integer rank selection, no interpolation,
    so both engines return the identical source rows. The sketch-based
    scale path is operators.aggregates.approx_quantiles (pytest-bounded
    against this exact tier)."""
    from prosnet_prefect_pipelines_spark.operators.aggregates import exact_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return exact_quantiles(ev, "event_type", "value", "event_id", [0.25, 0.5, 0.75, 0.9, 0.99])


def _prof_branch(col, is_num):
    mn = f"CAST(MIN({col}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
    mx = f"CAST(MAX({col}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
    smn = f"CAST(MIN({col}) AS VARCHAR)" if not is_num else "CAST(NULL AS VARCHAR)"
    smx = f"CAST(MAX({col}) AS VARCHAR)" if not is_num else "CAST(NULL AS VARCHAR)"
    return f"""
SELECT '{col}' AS column, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num, {smn} AS min_str, {smx} AS max_str
FROM lineitem"""


PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
PROFILE_STR = ["l_returnflag", "l_linestatus"]

PROFILE_SQL = "\nUNION ALL\n".join(
    [_prof_branch(c, True) for c in PROFILE_NUM]
    + [_prof_branch(c, False) for c in PROFILE_STR]
)


@register("table_profile", oracle=PROFILE_SQL, covers=["A1", "A2"])
def q_table_profile(spark, sf_dir):
    """Data-quality profile of the fact table (null counts, exact
    cardinality, typed min/max per column) in ONE aggregation pass —
    the validation gate a training pipeline runs before ingest."""
    from prosnet_prefect_pipelines_spark.operators.aggregates import profile_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return profile_table(li, PROFILE_NUM, PROFILE_STR)


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_pricing", oracle=ROLLUP_SQL, covers=["A2"])
def q_rollup_pricing(spark, sf_dir):
    """ROLLUP aggregation (per flag+status, per flag, grand total) in one
    pass — Spark expands grouping sets map-side and still partially
    aggregates; NULL grouping placeholders are coalesced to a sentinel
    so both engines emit identical keys."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events GROUP BY user_id
"""


@register("pivot_event_counts", oracle=PIVOT_SQL, covers=["A2"])
def q_pivot_event_counts(spark, sf_dir):
    """Long-to-wide pivot: per-user event-type counts as columns. The
    pivot values are pinned (no discovery pass), so this is one
    partial+final aggregation keyed by user — the feature-table shape
    fed to trainers."""
    from prosnet_prefect_pipelines_spark.model import read_events

    ev = read_events(spark, sf_dir)
    types = ["view", "click", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )
