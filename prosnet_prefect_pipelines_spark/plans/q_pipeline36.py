"""Pipeline batch 36: storage-layout and planning advisors — the
self-tuning reports a 100 TB deployment runs before committing to a
layout or a join strategy.

- ``zone_map_pruning_report``: per-file min/max zone maps under TWO
  layouts (date-partitioned vs hash-scattered) and which files a date
  predicate can skip — the quantified case for sort/partition layout
  (this is what partition pruning + parquet row-group skipping do with
  the statistics; the report makes the benefit measurable).
- ``watermark_lag_profile``: event-time disorder profile — per-event
  lateness vs the running event-time high-watermark in arrival order,
  rolled up per hour (max/p-sum lateness, late counts at two candidate
  watermark delays). THE input for choosing a streaming watermark.
  The raw feed arrives perfectly ordered (TESTDATA is synthetic), so a
  deterministic arrival jitter (every 10th event delayed 7 arrival
  slots) is applied in-query — batch-26 honesty convention: shapes
  real, disorder synthetic.
- ``join_strategy_advisor``: per join pair (fact x dim), exact row
  counts, distinct keys, and hot-key share (ppm) -> the strategy the
  engine should pick (broadcast / shuffle-hash / salted-skew) under
  explicit thresholds. The advisor mirrors what AQE decides at
  runtime; materializing it makes the decision auditable.

Scale notes: zone maps aggregate per (layout, file) — two shuffles on
small keys; the lag profile is one arrival-ordered running max (the
stream replay order) + an hour rollup; the advisor runs k tiny
aggregations over join keys (count-distinct + top-key share via one
group-by each).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- zone maps ----------------------------------------------------------------------------

_LO, _HI = "1995-06-01", "1995-09-01"

ZONEMAP_SQL = f"""
WITH files AS (
    SELECT o_orderkey, o_orderdate,
           'date' AS layout,
           CAST(strftime(o_orderdate, '%Y%m') AS BIGINT) AS file_id
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderdate, 'hash' AS layout,
           o_orderkey % 24 AS file_id
    FROM orders
),
zm AS (
    SELECT layout, file_id,
           CAST(MIN(o_orderdate) AS VARCHAR) AS min_date,
           CAST(MAX(o_orderdate) AS VARCHAR) AS max_date,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM files GROUP BY layout, file_id
)
SELECT layout, file_id, min_date, max_date, n_rows,
       (max_date < '{_LO}' OR min_date >= '{_HI}') AS prunable,
       CASE WHEN max_date < '{_LO}' OR min_date >= '{_HI}'
            THEN n_rows ELSE 0 END AS rows_skipped
FROM zm
"""


@register("zone_map_pruning_report", oracle=ZONEMAP_SQL, covers=["A2", "F16"])
def q_zone_map_pruning_report(spark, sf_dir):
    """Zone-map pruning report: the same fact table laid out
    date-partitioned (file = order month) vs hash-scattered (file =
    key mod 24), per-file min/max stats, and which files a 3-month
    predicate skips. Date layout prunes most files; hash layout prunes
    none — the measured argument for layout choice. Two small
    group-bys, nothing else."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    date_files = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.lit("date").alias("layout"),
        F.date_format("o_orderdate", "yyyyMM").cast("long").alias("file_id"),
    )
    hash_files = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.lit("hash").alias("layout"),
        (F.col("o_orderkey") % 24).alias("file_id"),
    )
    zm = (
        date_files.unionAll(hash_files)
        .groupBy("layout", "file_id")
        .agg(
            F.min("o_orderdate").cast("string").alias("min_date"),
            F.max("o_orderdate").cast("string").alias("max_date"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    prunable = (F.col("max_date") < _LO) | (F.col("min_date") >= _HI)
    return zm.select(
        "layout",
        "file_id",
        "min_date",
        "max_date",
        "n_rows",
        prunable.alias("prunable"),
        F.when(prunable, F.col("n_rows")).otherwise(F.lit(0)).cast("long").alias(
            "rows_skipped"
        ),
    )


# --- watermark lag profile ----------------------------------------------------------------

_JITTER = 7  # every 10th event arrives 7 slots late

WATERMARK_SQL = f"""
WITH arr AS (
    SELECT event_id, ts,
           event_id + CASE WHEN event_id % 10 = 0 THEN {_JITTER} ELSE 0 END
               AS arrival_key
    FROM events
),
ordered AS (
    SELECT event_id, ts,
           MAX(ts) OVER (ORDER BY arrival_key, event_id
                         ROWS UNBOUNDED PRECEDING) AS hwm
    FROM arr
),
lag AS (
    SELECT event_id, ts,
           CAST(date_diff('microsecond', ts, hwm) AS BIGINT) AS lateness_us
    FROM ordered
)
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us,
       CAST(SUM(CASE WHEN lateness_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS dropped_at_10min,
       CAST(SUM(CASE WHEN lateness_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS dropped_at_30min
FROM lag GROUP BY date_trunc('hour', ts)
"""


@register("watermark_lag_profile", oracle=WATERMARK_SQL, covers=["T1", "A2", "O1"])
def q_watermark_lag_profile(spark, sf_dir):
    """Watermark sizing profile: lateness of each event against the
    running event-time high-watermark in (jittered) arrival order,
    rolled up per hour with would-be drop counts at 10-min and 30-min
    candidate watermark delays. One arrival-ordered running-max window
    (the replay order a stream actually sees — sequential by nature,
    windowed here over the bounded replay) + one hour-keyed rollup."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")
    arr = ev.withColumn(
        "arrival_key",
        F.col("event_id")
        + F.when(F.col("event_id") % 10 == 0, F.lit(_JITTER)).otherwise(F.lit(0)),
    )
    # |V|-bound convention (r5 verdict item 4): a running max is an
    # associative scan, so decompose it instead of sorting the whole
    # stream on one partition (the original global window): (1) a
    # BLOCK-partitioned running max inside fixed arrival-key blocks,
    # (2) an exclusive prefix max over the per-block maxima — since r12
    # via the distributed ``distrank.prefix_max`` protocol, so even the
    # blocks table (N/65536 rows, corpus-growing) never funnels through
    # one partition, (3) hwm = greatest(prior-blocks prefix, local
    # running max). Identical to the sequential replay at every stage.
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_max,
    )

    _BLOCK = 65536
    arr = arr.withColumn("blk", F.floor(F.col("arrival_key") / _BLOCK))
    wloc = (
        Window.partitionBy("blk")
        .orderBy("arrival_key", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = arr.groupBy("blk").agg(F.max("ts").alias("blk_max"))
    prefix = prefix_max(
        blocks, [F.col("blk").asc()], F.col("blk_max"), "prev_hwm",
        exclusive=True,
    ).select("blk", "prev_hwm")
    lag = (
        arr.withColumn("local_hwm", F.max("ts").over(wloc))
        .join(F.broadcast(prefix), "blk")
        .select(
            "event_id",
            "ts",
            (
                F.unix_micros(
                    F.greatest(
                        F.col("local_hwm"),
                        F.coalesce(F.col("prev_hwm"), F.col("local_hwm")),
                    ).cast("timestamp")
                )
                - F.unix_micros(F.col("ts").cast("timestamp"))
            ).alias("lateness_us"),
        )
    )
    return lag.groupBy(
        F.date_trunc("hour", "ts").cast("string").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("lateness_us") > 0).cast("long")).cast("long").alias("n_late"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
        F.sum((F.col("lateness_us") > 600_000_000).cast("long")).cast("long").alias(
            "dropped_at_10min"
        ),
        F.sum((F.col("lateness_us") > 1_800_000_000).cast("long")).cast("long").alias(
            "dropped_at_30min"
        ),
    )


# --- join strategy advisor ----------------------------------------------------------------

_BROADCAST_ROWS = 100_000
_SKEW_PPM = 50_000  # hot key > 5% of rows

ADVISOR_SQL = f"""
WITH stats AS (
    SELECT 'lineitem->orders' AS pair, 'l_orderkey' AS key,
           (SELECT COUNT(*) FROM lineitem) AS fact_rows,
           (SELECT COUNT(*) FROM orders) AS dim_rows,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_keys,
           (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)) AS hot
    UNION ALL
    SELECT 'orders->customer', 'o_custkey',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(DISTINCT o_custkey) FROM orders),
           (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey))
    UNION ALL
    SELECT 'lineitem->part', 'l_partkey',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM part),
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
           (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey))
    UNION ALL
    SELECT 'customer->nation', 'c_nationkey',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
           (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_nationkey))
)
SELECT pair, key,
       CAST(fact_rows AS BIGINT) AS fact_rows,
       CAST(dim_rows AS BIGINT) AS dim_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(CAST(hot AS HUGEINT) * 1000000 // fact_rows AS BIGINT) AS hot_key_ppm,
       CASE WHEN dim_rows <= {_BROADCAST_ROWS} THEN 'broadcast'
            WHEN CAST(hot AS HUGEINT) * 1000000 // fact_rows > {_SKEW_PPM}
                THEN 'salted_skew'
            ELSE 'shuffle_hash' END AS strategy
FROM stats
"""


@register("join_strategy_advisor", oracle=ADVISOR_SQL, covers=["A1", "A2", "J1"])
def q_join_strategy_advisor(spark, sf_dir):
    """Join-strategy advisor: for each standard fact->dim pair, exact
    cardinalities, distinct keys, hot-key share (ppm) and the strategy
    the thresholds dictate — broadcast when the dim fits, salted-skew
    when one key exceeds 5% of the fact, shuffle-hash otherwise. This
    materializes (and makes auditable) the decision AQE takes from
    runtime stats; each pair costs one group-by over its join key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def pair(name, key, fact, dim):
        per = fact.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        stats = per.agg(
            F.count(F.lit(1)).alias("n_keys"), F.max("c").alias("hot")
        ).crossJoin(fact.agg(F.count(F.lit(1)).alias("fact_rows"))).crossJoin(
            dim.agg(F.count(F.lit(1)).alias("dim_rows"))
        )
        return stats.select(
            F.lit(name).alias("pair"),
            F.lit(key).alias("key"),
            F.col("fact_rows").cast("long").alias("fact_rows"),
            F.col("dim_rows").cast("long").alias("dim_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.expr(
                "CAST(CAST(hot AS DECIMAL(38,0)) * 1000000 div fact_rows AS BIGINT)"
            ).alias("hot_key_ppm"),
        )

    stats = (
        pair("lineitem->orders", "l_orderkey", li, o)
        .unionAll(pair("orders->customer", "o_custkey", o, c))
        .unionAll(pair("lineitem->part", "l_partkey", li, p))
        .unionAll(pair("customer->nation", "c_nationkey", c, n))
    )
    return stats.select(
        "*",
        F.when(F.col("dim_rows") <= _BROADCAST_ROWS, F.lit("broadcast"))
        .when(F.col("hot_key_ppm") > _SKEW_PPM, F.lit("salted_skew"))
        .otherwise(F.lit("shuffle_hash"))
        .alias("strategy"),
    )
