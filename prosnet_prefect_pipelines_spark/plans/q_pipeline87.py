"""Pipeline batch 87 (north-star extension): media/binary plumbing —
perceptual-lite fingerprint dedup, fixed-size chunk manifests with a
content-addressable dedup ratio, typed media-metadata profiling — plus
session bounce rates and order-size distributions.

Media payloads follow the multimodal tier's stub convention: text
bytes stand in for binary (the container lacks codecs), and the
Spark-side plumbing — sampling, chunking, hashing, schema — is real
and engine-checked."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# perceptual-lite fingerprint dedup.

PHASH_SQL = """
WITH media AS (
    SELECT doc_id, text AS payload, length(text) AS n
    FROM documents WHERE text IS NOT NULL AND length(text) >= 16
),
sig AS (
    -- 16-bit signature: sample 16 evenly-spaced bytes; bit = code > 109
    SELECT doc_id, n,
           list_sum(list_transform(generate_series(0, 15), i ->
               CASE WHEN ascii(substr(payload, 1 + (i * (n - 1)) // 15, 1)) > 109
                    THEN CAST(power(2, i) AS BIGINT) ELSE 0 END)) AS phash
    FROM media
),
g AS (
    SELECT phash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
    FROM sig GROUP BY phash
)
SELECT CAST(phash AS BIGINT) AS phash,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(keeper AS BIGINT) AS keeper
FROM g WHERE n_docs >= 2
"""


@register("media_phash_dedup", oracle=PHASH_SQL, covers=["A2", "P2"])
def q_media_phash_dedup(spark, sf_dir):
    """Perceptual-lite fingerprint dedup: each payload reduced to a
    16-bit signature from 16 evenly-spaced sampled bytes (bit = code
    above the lowercase midpoint) and collision groups elect a min-id
    keeper — the pHash-shaped dedup plumbing for opaque media columns
    (the real DCT kernel slots behind the same signature-groupBy
    shape). Sampling is pure per-row expressions; the rollup keys on
    the signature."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.length("text") >= 16)
    )
    n = F.length("text")
    bits = [
        F.when(
            F.ascii(
                F.expr(
                    f"substr(text, CAST(1 + ({i} * (length(text) - 1)) div 15 "
                    "AS INT), 1)"
                )
            )
            > 109,
            F.lit(2**i).cast("long"),
        ).otherwise(0)
        for i in range(16)
    ]
    sig_col = bits[0]
    for b in bits[1:]:
        sig_col = sig_col + b
    sig = docs.select("doc_id", sig_col.alias("phash"))
    g = sig.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper")
    )
    return g.filter(F.col("n_docs") >= 2).select(
        F.col("phash").cast("long").alias("phash"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("keeper").cast("long").alias("keeper"),
    )


# ---------------------------------------------------------------------------
# fixed-size chunk manifest + content-addressable dedup ratio.

CHUNK_SQL = """
WITH media AS (
    SELECT doc_id, text AS payload, length(text) AS n
    FROM documents WHERE text IS NOT NULL
),
chunks AS (
    SELECT doc_id, g.i AS chunk_idx,
           md5(substr(payload, 1 + g.i * 256, 256)) AS chunk_hash,
           least(256, n - g.i * 256) AS chunk_bytes
    FROM media, generate_series(0, 63) g(i)
    WHERE g.i * 256 < n
),
tot AS (
    SELECT COUNT(*) AS n_chunks, COUNT(DISTINCT chunk_hash) AS n_unique,
           SUM(chunk_bytes) AS total_bytes
    FROM chunks
)
SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_unique AS BIGINT) AS n_unique,
       CAST(total_bytes AS BIGINT) AS total_bytes,
       CAST(CAST(n_chunks - n_unique AS HUGEINT) * 1000000 // n_chunks
            AS BIGINT) AS dedup_ppm
FROM tot
"""


@register("media_chunk_manifest", oracle=CHUNK_SQL, covers=["A1", "A2"])
def q_media_chunk_manifest(spark, sf_dir):
    """Content-addressable chunk manifest: payloads split into fixed
    256-byte chunks, each hashed — the dedup ratio (chunks sharing a
    hash) is the storage saving a CAS blob store realizes. The
    fixed-size split is the contrast case to the content-defined (CDC)
    chunker already in the catalog; chunk fan-out is a bounded
    per-row explode."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    n = F.length("text")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.least(F.lit(63), ((n - 1) / 256).cast("int")))
        ).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("i").alias("chunk_idx"),
        F.md5(F.expr("substr(text, 1 + i * 256, 256)")).alias("chunk_hash"),
        F.least(F.lit(256), n - F.col("i") * 256).alias("chunk_bytes"),
    )
    return chunks.agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("chunk_hash").cast("long").alias("n_unique"),
        F.sum("chunk_bytes").cast("long").alias("total_bytes"),
    ).select(
        "n_chunks",
        "n_unique",
        "total_bytes",
        F.expr(
            "CAST(CAST(n_chunks - n_unique AS DECIMAL(38,0)) * 1000000 "
            "div n_chunks AS BIGINT)"
        ).alias("dedup_ppm"),
    )


# ---------------------------------------------------------------------------
# typed media-metadata profile.

METADATA_SQL = """
WITH media AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp'
           END AS format,
           320 + (doc_id * 37) % 1600 AS width,
           240 + (doc_id * 53) % 900 AS height,
           length(text) AS n_bytes
    FROM documents WHERE text IS NOT NULL
)
SELECT format,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
       CAST(MIN(width) AS BIGINT) AS min_width,
       CAST(MAX(height) AS BIGINT) AS max_height,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(CAST(n_bytes AS HUGEINT) * 1000000)
            // SUM(CAST(width AS HUGEINT) * height) AS BIGINT)
           AS micro_bytes_per_pixel
FROM media GROUP BY format
"""


@register("media_metadata_profile", oracle=METADATA_SQL, covers=["A2", "P1"])
def q_media_metadata_profile(spark, sf_dir):
    """Typed media-metadata profiling: every payload carries a
    (format, width, height) struct (deterministic stand-ins — real
    pipelines decode headers into exactly this schema), rolled up to
    per-format counts, pixel totals, and compression density
    (micro-bytes per pixel) — the corpus report a vision-data pipeline
    runs before training. Pure per-row derivation + one rollup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    k = F.col("doc_id")
    media = docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")),
            (k % 3 + 1).cast("int"),
        ).alias("format"),
        (320 + (k * 37) % 1600).alias("width"),
        (240 + (k * 53) % 900).alias("height"),
        F.length("text").alias("n_bytes"),
    )
    return media.groupBy("format").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("width").cast("long") * F.col("height"))
        .cast("long")
        .alias("total_pixels"),
        F.min("width").cast("long").alias("min_width"),
        F.max("height").cast("long").alias("max_height"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.expr(
            "CAST(SUM(CAST(n_bytes AS DECIMAL(38,0)) * 1000000) div "
            "SUM(CAST(width AS DECIMAL(38,0)) * height) AS BIGINT)"
        ).alias("micro_bytes_per_pixel"),
    )


# ---------------------------------------------------------------------------
# session bounce rate.

BOUNCE_SQL = """
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
    WHERE user_id IS NOT NULL
),
marked AS (
    SELECT user_id, ts_us,
           CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
                     OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
numbered AS (
    SELECT user_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
sessions AS (
    SELECT user_id, sid, COUNT(*) AS n_events FROM numbered
    GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // COUNT(*) AS BIGINT) AS bounce_ppm,
       CAST(CAST(SUM(n_events) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
           AS mean_events_micro
FROM sessions
"""


@register("bounce_rate_report", oracle=BOUNCE_SQL, covers=["A2", "T1"])
def q_bounce_rate_report(spark, sf_dir):
    """Session bounce rate: single-event sessions over all sessions
    (30-minute-gap sessionization) plus the truncating mean session
    depth — the engagement headline of every web-analytics report. Two
    user-keyed windows + one rollup."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = (
        marked.withColumn("sid", F.sum("new_s").over(wn))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) "
            "AS DECIMAL(38,0)) * 1000000 div COUNT(1) AS BIGINT)"
        ).alias("bounce_ppm"),
        F.expr(
            "CAST(CAST(SUM(n_events) AS DECIMAL(38,0)) * 1000000 "
            "div COUNT(1) AS BIGINT)"
        ).alias("mean_events_micro"),
    )


# ---------------------------------------------------------------------------
# order-size distribution.

ORDER_SIZE_SQL = """
WITH sizes AS (
    SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM sizes GROUP BY n_lines
"""


@register("order_size_distribution", oracle=ORDER_SIZE_SQL, covers=["A2"])
def q_order_size_distribution(spark, sf_dir):
    """Order-size distribution: how many orders have k lineitems — the
    basket-depth histogram (two stacked map-side-combinable
    aggregations; the second groups the bounded size domain)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    return sizes.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).select(F.col("n_lines").cast("long").alias("n_lines"), "n_orders")
