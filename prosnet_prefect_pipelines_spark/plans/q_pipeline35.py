"""Pipeline batch 35: training-order and multimodal-sequence prep —
the last two loader-facing shapes the corpus tier was missing.

- ``training_order_shuffle``: epoch-varying deterministic global
  shuffle. Every (doc, epoch) pair gets a shard and a within-shard
  position from the portable hash of (doc_id, epoch) — a different,
  reproducible permutation each epoch, with NO global sort: ordering
  is a per-shard window (shards are the parallel unit, exactly how a
  loader consumes them).
- ``interleaved_multimodal_seq``: MMC4-style image-text interleaving
  (Zhu et al. 2023): documents are cut into chunks; each doc's image
  payloads are assigned to the chunk they match best (here a
  deterministic hash match score standing in for the CLIP similarity,
  argmax per image with smallest-chunk tie-break — the assignment
  SHAPE is the deliverable, per the batch-26 honesty convention);
  output is the interleaved (doc, seq_pos, modality, content) stream.

Scale notes (100 TB): the shuffle assigns shards by hash (narrow) and
windows only within a shard — parallelism = shard count, state = one
shard's rows; this is the standard "shard then shuffle-within-shard"
loader contract. Interleaving joins images to chunks per doc (keyed by
doc), argmax via one aggregation; the explode is bounded by
tokens/chunk_size + images per doc.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import _hash48, _hash48_sql

_SHARDS = 8
_EPOCHS = 2

SHUFFLE_SQL = f"""
WITH pairs AS (
    SELECT doc_id, g.e AS epoch,
           {_hash48_sql("doc_id", "'||'shuffle'||CAST(g.e AS VARCHAR)||'")} AS h
    FROM documents, LATERAL (
        SELECT UNNEST(generate_series(1, {_EPOCHS})) AS e
    ) g
)
SELECT doc_id, epoch,
       CAST(h % {_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY epoch, h % {_SHARDS} ORDER BY h // {_SHARDS}, doc_id
       ) AS BIGINT) AS pos
FROM pairs
"""


@register("training_order_shuffle", oracle=SHUFFLE_SQL, covers=["O1", "A2"])
def q_training_order_shuffle(spark, sf_dir):
    """Epoch-varying deterministic global shuffle: shard = hash(doc,
    epoch) mod S, position = rank of the remaining hash bits within
    the shard (doc_id tie-break). Each epoch is an independent
    reproducible permutation; ordering windows run PER (epoch, shard) —
    never a global sort — so parallelism equals the shard count and any
    shard can be materialized independently (the loader contract)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1).cast("long"), F.lit(_EPOCHS).cast("long"))).alias(
            "epoch"
        ),
    )
    # hash of (doc_id || 'shuffle' || epoch) — identical string input to
    # the DuckDB twin
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("shuffle"),
                    F.col("epoch").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pairs = pairs.select("doc_id", "epoch", h.alias("h"))
    w = Window.partitionBy("epoch", F.expr(f"h % {_SHARDS}")).orderBy(
        F.expr(f"h div {_SHARDS}"), "doc_id"
    )
    return pairs.select(
        "doc_id",
        "epoch",
        F.expr(f"CAST(h % {_SHARDS} AS BIGINT)").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


_CHUNK = 32  # tokens per text chunk
_IMGS = 2  # synthetic images per doc

INTERLEAVE_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
chunks AS (
    SELECT t.doc_id, g.i AS chunk_id,
           array_to_string(list_slice(t.toks, g.i * {_CHUNK} + 1,
                                      g.i * {_CHUNK} + {_CHUNK}), ' ') AS chunk
    FROM t, LATERAL (
        SELECT UNNEST(generate_series(0,
            CAST(ceil(len(t.toks) / {_CHUNK}.0) AS BIGINT) - 1)) AS i
    ) g
),
imgs AS (
    SELECT doc_id, g.k AS img_id
    FROM t, LATERAL (SELECT UNNEST(generate_series(0, {_IMGS} - 1)) AS k) g
),
match AS (
    SELECT i.doc_id, i.img_id, c.chunk_id,
           {_hash48_sql("CAST(i.doc_id AS VARCHAR) || ':' || CAST(i.img_id AS VARCHAR) || ':' || CAST(c.chunk_id AS VARCHAR)", "mm")}
               % 1099511627776 AS score
    FROM imgs i JOIN chunks c USING (doc_id)
),
best AS (
    SELECT doc_id, img_id,
           -- argmax score, smallest chunk on ties (encoded in one MIN)
           CAST(MIN((1099511627775 - score) * 1048576 + chunk_id) % 1048576
                AS BIGINT) AS chunk_id
    FROM match GROUP BY doc_id, img_id
),
seq AS (
    SELECT doc_id, chunk_id, 0 AS sub, 'text' AS modality, chunk AS content
    FROM chunks
    UNION ALL
    SELECT doc_id, chunk_id, 1 + img_id AS sub, 'image' AS modality,
           'img:' || CAST(doc_id AS VARCHAR) || '/' || CAST(img_id AS VARCHAR)
               AS content
    FROM best
)
SELECT doc_id,
       CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY chunk_id, sub
       ) - 1 AS BIGINT) AS seq_pos,
       modality, content
FROM seq
"""


@register("interleaved_multimodal_seq", oracle=INTERLEAVE_SQL, covers=["P2", "O1", "J1"])
def q_interleaved_multimodal_seq(spark, sf_dir):
    """MMC4-style interleaving: text chunks in document order, each
    image inserted directly after its best-matching chunk (argmax match
    score per image, smallest-chunk tie-break — computed as ONE
    map-side MIN over an inverted-score<<20|chunk key, the same
    encoded-argmax trick as winnowing). The final sequence ordering is
    a per-doc window — parallel across documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size("toks") / F.lit(float(_CHUNK))).cast("long")
    chunks = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("_i") * _CHUNK + 1, _CHUNK), " "
            ).alias("chunk"),
        )
    )
    imgs = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(_IMGS - 1).cast("long"))
        ).alias("img_id"),
    )
    key = F.concat_ws(
        ":",
        F.col("doc_id").cast("string"),
        F.col("img_id").cast("string"),
        F.col("chunk_id").cast("string"),
    )
    match = imgs.join(chunks.select("doc_id", "chunk_id"), "doc_id").select(
        "doc_id", "img_id", "chunk_id", (_hash48(key, "mm") % 1099511627776).alias("score")
    )
    best = match.groupBy("doc_id", "img_id").agg(
        F.expr(
            "CAST(MIN((1099511627775 - score) * 1048576 + chunk_id) % 1048576"
            " AS BIGINT)"
        ).alias("chunk_id")
    )
    text_rows = chunks.select(
        "doc_id",
        "chunk_id",
        F.lit(0).alias("sub"),
        F.lit("text").alias("modality"),
        F.col("chunk").alias("content"),
    )
    img_rows = best.select(
        "doc_id",
        "chunk_id",
        (F.lit(1) + F.col("img_id")).cast("int").alias("sub"),
        F.lit("image").alias("modality"),
        F.concat(
            F.lit("img:"),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("img_id").cast("string"),
        ).alias("content"),
    )
    seq = text_rows.unionAll(img_rows)
    w = Window.partitionBy("doc_id").orderBy("chunk_id", "sub")
    return seq.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("seq_pos"),
        "modality",
        "content",
    )
