"""Pipeline batch 32: Winnowing document fingerprints (Schleimer,
Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for Document
Fingerprinting" — the MOSS algorithm) — the guarantee-bearing
fingerprint selection the dedup family was missing: any shared
substring of length >= w + k - 1 is provably caught by at least one
shared fingerprint.

- ``winnowing_fingerprints``: per doc, the selected (position, hash)
  set — k-gram (k=3) rolling hashes, window w=4, rightmost-minimum
  selection.
- ``winnow_overlap_pairs``: MOSS pairing — doc pairs ranked by shared
  fingerprint count (>= 2), the plagiarism/near-dup candidate report.

Relational formulation (the part worth reading): instead of a
per-window argmin via a non-equi self-join (O(n·w) join rows and a
BroadcastNestedLoop in Spark), every k-gram EXPLODES its <= w valid
window-starts — a narrow generator — and each window reduces with one
map-side-combined MIN over a composite key ``hash * 2^20 + (2^20-1-p)``
that encodes rightmost-tie-break INSIDE the min (robust winnowing's
tie rule, no second pass). Selection is then one groupBy + one
distinct, both keyed by (doc, window)/(doc, pos) — zero joins, zero
windows, scales like any token explode.

Scale notes (100 TB): fingerprint density is ~2/(w+1) per token
(winnowing's published bound), so output is a constant fraction of the
token stream. The overlap join moves only fingerprint postings;
boilerplate hashes behave like hot LSH buckets — the same bucket-cap
salting (similarity.rhp_lsh_topk) applies; here the corpus is clean
enough that the raw postings join is exact and wedge-bounded.

Hashes are the portable 48-bit md5 prefix (q_pipeline15._hash48),
digit-identical in DuckDB, so the whole selection is value-hash
checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import _hash48, _hash48_sql

_K = 3  # k-gram width (tokens)
_W = 4  # winnowing window (k-grams)
# composite key: 40-bit hash << 20 | (2^20-1 - pos): min() picks the
# smallest hash, ties resolve to the LARGEST position (rightmost rule)
_POS_BITS = 20
_POS_MASK = (1 << _POS_BITS) - 1

WINNOW_CTE = f"""
t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
grams AS (
    SELECT t.doc_id, g.i AS p,
           {_hash48_sql(f"array_to_string(list_slice(t.toks, g.i, g.i + {_K} - 1), ' ')", "wn")}
               % 1099511627776 AS h,
           len(t.toks) - {_K} + 1 AS n_grams
    FROM t, LATERAL (
        SELECT UNNEST(generate_series(1, len(t.toks) - {_K} + 1)) AS i
    ) g
    WHERE len(t.toks) >= {_K}
),
starts AS (
    SELECT doc_id, p, h,
           UNNEST(generate_series(greatest(1, p - {_W} + 1),
                                  least(p, greatest(n_grams - {_W} + 1, 1)))) AS s
    FROM grams
),
sel AS (
    SELECT doc_id, s,
           MIN(h * {1 << _POS_BITS} + ({_POS_MASK} - p)) AS key
    FROM starts GROUP BY doc_id, s
),
fps AS (
    SELECT DISTINCT doc_id,
           CAST({_POS_MASK} - (key % {1 << _POS_BITS}) AS BIGINT) AS pos,
           CAST(key // {1 << _POS_BITS} AS BIGINT) AS fp
    FROM sel
)
"""

WINNOW_SQL = f"WITH {WINNOW_CTE} SELECT doc_id, pos, fp FROM fps"


def _fingerprints(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _K)
        .select(
            "doc_id",
            (F.size("toks") - _K + 1).alias("n_grams"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - _K + 1),
                    lambda i: F.array_join(F.slice(F.col("toks"), i, _K), " "),
                )
            ).alias("_i", "gram"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_i") + 1).alias("p"),
            (_hash48(F.col("gram"), "wn") % 1099511627776).alias("h"),
        )
    )
    starts = grams.select(
        "doc_id",
        "p",
        "h",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("p") - _W + 1),
                F.least(F.col("p"), F.greatest(F.col("n_grams") - _W + 1, F.lit(1))),
            )
        ).alias("s"),
    )
    sel = starts.groupBy("doc_id", "s").agg(
        F.min(F.col("h") * (1 << _POS_BITS) + (_POS_MASK - F.col("p"))).alias("key")
    )
    return sel.select(
        "doc_id",
        (F.lit(_POS_MASK) - F.col("key") % (1 << _POS_BITS)).cast("long").alias("pos"),
        # integer div, NOT '/': keys reach 60 bits and double arithmetic
        # would round above 2^53
        F.expr(f"key div {1 << _POS_BITS}").cast("long").alias("fp"),
    ).distinct()


@register("winnowing_fingerprints", oracle=WINNOW_SQL, covers=["A2", "O6"])
def q_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprint selection: 3-gram rolling hashes,
    window 4, rightmost-minimum — any shared 6-token substring between
    two documents is guaranteed to share a fingerprint. No joins:
    window membership is a narrow <= w-way explode per gram and the
    argmin is ONE map-side-combined MIN over a hash<<20|revpos key
    (rightmost tie-break encoded in the key, per the robust-winnowing
    rule)."""
    return _fingerprints(spark, sf_dir)


OVERLAP_SQL = f"""
WITH {WINNOW_CTE},
uniq AS (SELECT DISTINCT doc_id, fp FROM fps)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM uniq a JOIN uniq b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""


@register("winnow_overlap_pairs", oracle=OVERLAP_SQL, covers=["J1", "A2"])
def q_winnow_overlap_pairs(spark, sf_dir):
    """MOSS pairing: doc pairs sharing >= 2 winnowing fingerprints,
    with the shared count — the plagiarism/near-dup candidate report.
    Only fingerprint postings move (a constant ~2/(w+1) fraction of
    tokens); the self-join is keyed on the fingerprint like an LSH
    bucket join, with the same hot-bucket salting available when
    boilerplate floods one hash."""
    uniq = _fingerprints(spark, sf_dir).select("doc_id", "fp").distinct()
    a = uniq.alias("a")
    b = uniq.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )
