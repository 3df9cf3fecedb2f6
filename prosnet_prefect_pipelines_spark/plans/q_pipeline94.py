"""Pipeline batch 94 (north-star extension, closing): three last
engine-parity surfaces — JSON struct round-trips, weekday revenue
indexes, and the min_by/max_by (argmin/argmax) aggregate family."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# JSON struct round-trip.

JSON_RT_SQL = """
WITH src AS (
    SELECT n_nationkey,
           to_json(struct_pack(k := n_nationkey, name := n_name,
                               region := n_regionkey)) AS j
    FROM nation
)
SELECT n_nationkey,
       CAST(json_extract(j, '$.k') AS BIGINT) AS k_back,
       json_extract_string(j, '$.name') AS name_back,
       CAST(json_extract(j, '$.region') AS BIGINT) AS region_back,
       CAST(CASE WHEN CAST(json_extract(j, '$.k') AS BIGINT) = n_nationkey
                 THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
FROM src
"""


@register("json_struct_roundtrip", oracle=JSON_RT_SQL, covers=["F21", "P2"])
def q_json_struct_roundtrip(spark, sf_dir):
    """JSON struct round-trip: rows packed into JSON objects and parsed
    back field by field — the serialize/deserialize parity every
    JSON-carrying pipeline column depends on (field order and number
    formatting differ between engines, so the comparison extracts
    FIELDS, never the raw string). Pure per-row expressions."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = F.to_json(
        F.struct(
            F.col("n_nationkey").alias("k"),
            F.col("n_name").alias("name"),
            F.col("n_regionkey").alias("region"),
        )
    )
    src = nation.select("n_nationkey", j.alias("j"))
    return src.select(
        "n_nationkey",
        F.get_json_object("j", "$.k").cast("long").alias("k_back"),
        F.get_json_object("j", "$.name").alias("name_back"),
        F.get_json_object("j", "$.region").cast("long").alias("region_back"),
        F.when(
            F.get_json_object("j", "$.k").cast("long") == F.col("n_nationkey"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# weekday revenue index.

WEEKDAY_INDEX_SQL = """
WITH o AS (
    SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (SELECT dow, COUNT(*) AS n, SUM(cents) AS cents FROM o GROUP BY dow),
avg_ AS (SELECT SUM(cents) // 7 AS per_dow FROM g)
SELECT CAST(g.dow AS BIGINT) AS dow,
       CAST(g.n AS BIGINT) AS n_orders,
       CAST(g.cents AS BIGINT) AS cents,
       CAST(CAST(g.cents AS HUGEINT) * 1000000 // a.per_dow AS BIGINT)
           AS index_ppm
FROM g CROSS JOIN avg_ a
"""


@register("weekday_revenue_index", oracle=WEEKDAY_INDEX_SQL, covers=["A2", "F16"])
def q_weekday_revenue_index(spark, sf_dir):
    """Weekday revenue index: each ISO weekday's revenue against the
    uniform per-weekday average (1e6 = average) — the seasonality index
    a demand planner de-seasonalizes with; ISO day numbering pinned on
    both engines. One rollup + a broadcast single-row average."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    isodow = ((F.dayofweek(F.to_date("o_orderdate")) + 5) % 7) + 1
    g = o.select(
        isodow.alias("dow"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
    )
    avg_ = g.agg(F.expr("CAST(SUM(cents) div 7 AS BIGINT)").alias("per_dow"))
    return g.join(F.broadcast(avg_)).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("cents").cast("long").alias("cents"),
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div per_dow AS BIGINT)"
        ).alias("index_ppm"),
    )


# ---------------------------------------------------------------------------
# min_by / max_by parity.

MINBY_SQL = """
SELECT c_nationkey AS nation,
       CAST((MIN(struct_pack(b := CAST(round(c_acctbal * 100) AS BIGINT),
                             c := c_custkey))).c AS BIGINT) AS poorest_cust,
       CAST((MAX(struct_pack(b := CAST(round(c_acctbal * 100) AS BIGINT),
                             c := c_custkey))).c AS BIGINT) AS richest_cust,
       CAST(MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS min_cents,
       CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM customer GROUP BY c_nationkey
"""


@register("minby_maxby_parity", oracle=MINBY_SQL, covers=["O6", "A2"])
def q_minby_maxby_parity(spark, sf_dir):
    """The argmin/argmax aggregate family: Spark's min_by/max_by picking
    the customer holding each nation's extreme balance — the one-pass
    alternative to a rank-window top-1 (half the shuffles).

    The winner is deterministic BY CONSTRUCTION: the ordering key is the
    composite (balance_cents, custkey) struct, so a balance tie at an
    extreme resolves to the lowest (min) / highest (max) custkey in both
    engines — DuckDB's arg_min can't take a composite key, so the oracle
    uses the equivalent struct-MIN/MAX extraction (lexicographic struct
    ordering, identical in both engines; the struct key is unique, so
    struct-min == min_by). sf0.1 really does carry duplicate acctbals
    within nations — a raw-balance key would be tie-nondeterministic."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    key = F.struct(cents.alias("b"), F.col("c_custkey").alias("c"))
    return c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.min_by("c_custkey", key).cast("long").alias("poorest_cust"),
        F.max_by("c_custkey", key).cast("long").alias("richest_cust"),
        F.min(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("min_cents"),
        F.max(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("max_cents"),
    )
