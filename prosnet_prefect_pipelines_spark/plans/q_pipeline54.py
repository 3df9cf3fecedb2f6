"""Pipeline batch 54: storage/telemetry systems ops —

- ``path_hierarchy_rollup``: materialized-path rollup of URL paths:
  doc counts at every path prefix (depth 1 and 2) — the content
  taxonomy a crawler dashboard shows. Prefix extraction is a narrow
  split/slice; the rollup is one keyed aggregation per depth, unioned.
- ``delta_encoding_estimate``: Gorilla/time-series-style compression
  sizing: per-user timestamp deltas classified into byte classes
  (<=1/2/4/8 bytes by magnitude), estimated encoded size vs raw
  8 bytes/row, in exact integers. The report that justifies
  delta-encoding timestamp columns; one lag window + one rollup.
- ``impossible_travel``: security telemetry: consecutive events of a
  user whose (derived grid) locations are too far apart for the time
  elapsed — the classic account-compromise signal. Speed test in
  exact integers by cross-multiplication: dist2 * T2 > vmax2 * dt2
  (squares both sides, no sqrt). One keyed lag window.

Scale notes: all three are narrow passes plus keyed windows/rollups —
zero joins; the path rollup unions two tiny aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline2 import _spark_urls

PATH_SQL = """
WITH built AS (
    SELECT doc_id,
           CASE doc_id % 5
               WHEN 0 THEN '/Path/' || CAST(doc_id AS VARCHAR) || '/'
               WHEN 1 THEN '/a/b'
               WHEN 2 THEN ''
               WHEN 3 THEN '/pub/'
               ELSE NULL END AS path
    FROM documents
),
segs AS (
    SELECT doc_id, string_split(trim(path, '/'), '/') AS s
    FROM built WHERE path IS NOT NULL AND trim(path, '/') <> ''
),
lvl1 AS (
    SELECT 1 AS depth, '/' || s[1] AS prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM segs GROUP BY s[1]
),
lvl2 AS (
    SELECT 2 AS depth, '/' || s[1] || '/' || s[2] AS prefix,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM segs WHERE len(s) >= 2 GROUP BY s[1], s[2]
)
SELECT CAST(depth AS BIGINT) AS depth, prefix, n_docs FROM lvl1
UNION ALL
SELECT CAST(depth AS BIGINT), prefix, n_docs FROM lvl2
"""


@register("path_hierarchy_rollup", oracle=PATH_SQL, covers=["P2", "A2"])
def q_path_hierarchy_rollup(spark, sf_dir):
    """URL path taxonomy: doc counts per depth-1 and depth-2 path
    prefix (the materialized-path rollup). The paths come from the
    shared synthetic URL corpus's own branch structure; extraction is
    narrow split/slice, each depth one keyed count."""
    from prosnet_prefect_pipelines_spark.operators import web as W

    urls = _spark_urls(spark, sf_dir)
    path = W.url_path(F.col("url"))
    segs = (
        urls.select("doc_id", path.alias("path"))
        .filter(F.col("path").isNotNull())
        .select(
            "doc_id",
            F.split(F.expr("trim(BOTH '/' FROM path)"), "/").alias("s"),
        )
        .filter(F.expr("trim(BOTH '/' FROM array_join(s, '/'))") != "")
    )
    lvl1 = segs.groupBy(F.element_at("s", 1).alias("seg1")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select(
        F.lit(1).cast("long").alias("depth"),
        F.concat(F.lit("/"), F.col("seg1")).alias("prefix"),
        "n_docs",
    )
    lvl2 = (
        segs.filter(F.size("s") >= 2)
        .groupBy(
            F.element_at("s", 1).alias("seg1"), F.element_at("s", 2).alias("seg2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            F.lit(2).cast("long").alias("depth"),
            F.concat(F.lit("/"), "seg1", F.lit("/"), "seg2").alias("prefix"),
            "n_docs",
        )
    )
    return lvl1.unionAll(lvl2)


DELTA_ENC_SQL = """
WITH ordered AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev
    FROM events
),
deltas AS (
    SELECT user_id,
           CASE WHEN prev IS NULL THEN 8
                WHEN ts_us - prev < 256 THEN 1
                WHEN ts_us - prev < 65536 THEN 2
                WHEN ts_us - prev < 4294967296 THEN 4
                ELSE 8 END AS enc_bytes
    FROM ordered
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
       CAST(SUM(enc_bytes) AS BIGINT) AS delta_bytes,
       CAST(CAST(SUM(enc_bytes) AS HUGEINT) * 1000000 // (COUNT(*) * 8) AS BIGINT)
           AS ratio_ppm
FROM deltas GROUP BY user_id
"""


@register("delta_encoding_estimate", oracle=DELTA_ENC_SQL, covers=["A2", "O1"])
def q_delta_encoding_estimate(spark, sf_dir):
    """Delta-encoding sizing for the timestamp column: per-user deltas
    in arrival order fall into 1/2/4/8-byte classes; the report gives
    encoded vs raw bytes and the compression ratio in ppm — exact
    integers, one keyed lag window + one rollup (the Gorilla-paper
    argument, measured on this feed)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = ev.withColumn("prev", F.lag("ts_us").over(w))
    enc = (
        F.when(F.col("prev").isNull(), F.lit(8))
        .when(F.col("ts_us") - F.col("prev") < 256, F.lit(1))
        .when(F.col("ts_us") - F.col("prev") < 65536, F.lit(2))
        .when(F.col("ts_us") - F.col("prev") < 4294967296, F.lit(4))
        .otherwise(F.lit(8))
    )
    rows = d.select("user_id", enc.alias("enc_bytes"))
    return rows.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) * 8).cast("long").alias("raw_bytes"),
        F.sum("enc_bytes").cast("long").alias("delta_bytes"),
        F.expr(
            "CAST(CAST(SUM(enc_bytes) AS DECIMAL(38,0)) * 1000000"
            " div (COUNT(*) * 8) AS BIGINT)"
        ).alias("ratio_ppm"),
    )


# grid locations derived from the event id; vmax in grid-units/hour
_VMAX = 3
_US_HOUR = 3_600_000_000

TRAVEL_SQL = f"""
WITH located AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(event_id % 23 AS BIGINT) AS x,
           CAST((event_id * 11) % 19 AS BIGINT) AS y
    FROM events
),
paired AS (
    SELECT user_id, event_id, ts_us, x, y,
           lag(event_id) OVER w AS prev_id,
           lag(ts_us) OVER w AS prev_ts,
           lag(x) OVER w AS px, lag(y) OVER w AS py
    FROM located
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_id, prev_id,
       CAST((x - px) * (x - px) + (y - py) * (y - py) AS BIGINT) AS dist2,
       CAST(ts_us - prev_ts AS BIGINT) AS dt_us,
       ((x - px) * (x - px) + (y - py) * (y - py))
           * CAST({_US_HOUR} AS HUGEINT) * {_US_HOUR}
           > CAST({_VMAX * _VMAX} AS HUGEINT)
             * (ts_us - prev_ts) * (ts_us - prev_ts) AS impossible
FROM paired WHERE prev_id IS NOT NULL
"""


@register("impossible_travel", oracle=TRAVEL_SQL, covers=["T1", "A2", "O1"])
def q_impossible_travel(spark, sf_dir):
    """Impossible-travel detection: consecutive events of a user whose
    grid distance over elapsed time exceeds vmax — tested by integer
    cross-multiplication (dist2 * T_hour^2 > vmax^2 * dt^2; squares
    both sides, no sqrt, no floats). One keyed lag window over the
    located stream; the compromise signal every auth pipeline runs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("CAST(event_id % 23 AS BIGINT)").alias("x"),
        F.expr("CAST((event_id * 11) % 19 AS BIGINT)").alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    paired = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "x",
        "y",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lag("ts_us").over(w).alias("prev_ts"),
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
    ).filter(F.col("prev_id").isNotNull())
    dist2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    return paired.select(
        "user_id",
        "event_id",
        "prev_id",
        dist2.cast("long").alias("dist2"),
        (F.col("ts_us") - F.col("prev_ts")).cast("long").alias("dt_us"),
        F.expr(
            f"((x - px) * (x - px) + (y - py) * (y - py))"
            f" * CAST({_US_HOUR} AS DECIMAL(38,0)) * {_US_HOUR}"
            f" > CAST({_VMAX * _VMAX} AS DECIMAL(38,0))"
            f" * (ts_us - prev_ts) * (ts_us - prev_ts)"
        ).alias("impossible"),
    )
