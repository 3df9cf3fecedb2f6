"""Text-analysis + multimodal queries over documents (north-star
extension). Language markers are appended in-query from the lang column
to give the classifier signal to find (the raw corpus is same-vocabulary
synthetic text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import multimodal as M
from prosnet_prefect_pipelines_spark.operators import textstats as T
from prosnet_prefect_pipelines_spark.plans.catalog import register

# documents with language-marker words mixed in for lang-id to detect
LANG_TEXT_CTE = """
lang_docs AS (
    SELECT doc_id, lang,
           text || CASE lang
               WHEN 'de' THEN ' der die das und der die'
               WHEN 'fr' THEN ' le la les et le la'
               WHEN 'es' THEN ' el los que y el los'
               ELSE '' END AS text
    FROM documents
)
"""


def lang_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    suffix = (
        F.when(F.col("lang") == "de", F.lit(" der die das und der die"))
        .when(F.col("lang") == "fr", F.lit(" le la les et le la"))
        .when(F.col("lang") == "es", F.lit(" el los que y el los"))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", "lang", F.concat(F.col("text"), suffix).alias("text"))


def _score_sql(markers: list[str]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return (
        "len(list_filter(string_split_regex(trim(text), '\\s+'),"
        f" t -> t IN ({in_list})))"
    )


LANG_ID_SQL = f"""
WITH {LANG_TEXT_CTE},
scored AS (
    SELECT doc_id, lang,
           {_score_sql(T.LANG_MARKERS["en"])} AS s_en,
           {_score_sql(T.LANG_MARKERS["de"])} AS s_de,
           {_score_sql(T.LANG_MARKERS["fr"])} AS s_fr,
           {_score_sql(T.LANG_MARKERS["es"])} AS s_es
    FROM lang_docs
)
SELECT doc_id, lang AS true_lang,
       CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS detected_lang
FROM scored
"""


@register("text_lang_id", oracle=LANG_ID_SQL, covers=["F13"])
def q_text_lang_id(spark, sf_dir):
    """Marker-stopword language ID: argmax hit count, ties in
    [en, de, fr, es] order, no hits -> 'und'."""
    docs = lang_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        T.lang_id(F.col("text")).alias("detected_lang"),
    )


QUALITY_SQL = """
WITH t AS (
    SELECT doc_id, text,
           string_split_regex(trim(text), '\\s+') AS toks,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
    FROM documents
),
s AS (
    SELECT doc_id, n_chars, len(toks) AS n_tokens, n_punct,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS n_stop
    FROM t
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round((n_chars - (n_tokens - 1)) / n_tokens, 6) AS avg_token_len,
       round(n_punct / n_chars, 6) AS punct_ratio,
       round(n_stop / n_tokens, 6) AS stopword_ratio,
       round(0.4 * least(n_tokens / 100.0, 1.0)
             + 0.4 * round(n_stop / n_tokens, 6)
             + 0.2 * (1 - round(n_punct / n_chars, 6)), 6) AS quality
FROM s
"""


@register("text_quality", oracle=QUALITY_SQL, covers=["P7"])
def q_text_quality(spark, sf_dir):
    """Quality features + composite score: length, token, punctuation,
    stopword ratios — all exact rational arithmetic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = T.quality_stats(F.col("text"))
    return docs.select(
        "doc_id",
        stats["n_chars"].alias("n_chars"),
        stats["n_tokens"].alias("n_tokens"),
        stats["avg_token_len"].alias("avg_token_len"),
        stats["punct_ratio"].alias("punct_ratio"),
        stats["stopword_ratio"].alias("stopword_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, ch) -> (acc * 31 + ch) % {T.FP_MOD}) AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=FINGERPRINT_SQL, covers=["F1"])
def q_text_fingerprint(spark, sf_dir):
    """Order-sensitive polynomial rolling hash per document + token count —
    the document-fingerprinting primitive."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fingerprint"),
    )


MULTIMODAL_SQL = f"""
SELECT doc_id AS id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       ascii(substr(text, 1, 1)) AS first_byte,
       ascii(substr(text, length(text), 1)) AS last_byte,
       CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, ch) -> acc + ch) % {M.ADLER_MOD} AS BIGINT) AS checksum
FROM documents
"""


@register("multimodal_features", oracle=MULTIMODAL_SQL, covers=[])
def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: text -> binary payload column + metadata struct
    -> Arrow-batched mapInPandas feature extraction (the decode stub's
    contract), oracle-checked byte-for-byte. ASCII corpus => byte stats
    computable from the text in SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    return M.extract_binary_features(payload)


FRAMES_SQL = """
SELECT doc_id AS id, frame_idx, frame_len, frame_md5 FROM (
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           -- ASCII corpus: byte slices == char slices, so the oracle can
           -- express the frame bytes with substring on the text
           CAST((f + 1) * strlen(text) // 4 - f * strlen(text) // 4 AS BIGINT)
               AS frame_len,
           md5(substring(text,
                         CAST(f * strlen(text) // 4 + 1 AS INT),
                         CAST((f + 1) * strlen(text) // 4
                              - f * strlen(text) // 4 AS INT))) AS frame_md5
    FROM documents, generate_series(0, 3) t(f)
) WHERE frame_len > 0
"""


DECODE_SQL = """
-- images are at most 8x6x3 = 144 pixel bytes, so an uncorrelated
-- series joined on i < n enumerates every pixel index
SELECT d.doc_id AS id,
       'ppm' AS format,
       CAST(4 + d.doc_id % 5 AS INT) AS width,
       CAST(3 + d.doc_id % 4 AS INT) AS height,
       3 AS channels,
       CAST(SUM((d.doc_id * 3 + s.i) % 256) AS BIGINT) AS sum_pixels,
       CAST(COUNT(*) AS BIGINT) AS n_pixels
FROM documents d
JOIN generate_series(0, 143) s(i)
  ON s.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4) * 3
GROUP BY d.doc_id
"""


@register("multimodal_decode", oracle=DECODE_SQL, covers=[])
def q_multimodal_decode(spark, sf_dir):
    """REAL image decode: a deterministic P6 PPM is synthesized per doc
    (pixels a pure function of doc_id), then decode_image parses header +
    pixel bytes back out (pure-stdlib decoder, also handles BMP/PNG). The
    oracle recomputes dimensions and the exact pixel sum per image."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return M.decode_image(M.synthesize_ppm(docs, "doc_id"))


RESIZE_SQL = """
WITH cells AS (
    SELECT doc_id, text, j,
           j * length(text) // 16 AS lo,
           CASE WHEN (j + 1) * length(text) // 16 <= j * length(text) // 16
                THEN j * length(text) // 16 + 1
                ELSE (j + 1) * length(text) // 16 END AS hi
    FROM documents, generate_series(0, 15) t(j)
    WHERE length(text) > 0
)
SELECT doc_id AS id, CAST(j AS INT) AS cell_idx,
       CAST(list_sum(list_transform(generate_series(lo + 1, hi),
                                    i -> ascii(substr(text, i, 1))))
            // (hi - lo) AS INT) AS cell
FROM cells
"""


@register("multimodal_resize", oracle=RESIZE_SQL, covers=[])
def q_multimodal_resize(spark, sf_dir):
    """Resize plumbing: payload bytes average-pooled into 16 cells via
    mapInPandas (the deterministic stand-in for image resize), cells
    exploded to rows so the oracle can recompute every window mean with
    byte arithmetic (ASCII corpus: byte == ascii(char))."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    pooled = M.resize_bytes(payload, out_len=16)
    return pooled.select(
        "id", F.posexplode("cells").alias("cell_idx", "cell")
    )


@register("multimodal_frame_sample", oracle=FRAMES_SQL, covers=[])
def q_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: payload -> 4 contiguous byte frames via
    mapInPandas, fingerprinted Spark-side with md5(frame). The oracle
    recomputes every frame's bytes with substring arithmetic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    frames = M.sample_frames(payload, n_frames=4)
    return frames.select(
        "id",
        "frame_idx",
        F.expr("octet_length(frame)").cast("long").alias("frame_len"),
        F.md5(F.col("frame")).alias("frame_md5"),
    )


NORMALIZE_SQL = """
WITH norm AS (
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower('  MiXeD ' || text || chr(9) || 'End  '),
                              '[\\x00-\\x1f\\x7f]', ' ', 'g'),
               '\\s+', ' ', 'g')) AS clean
    FROM documents
)
SELECT doc_id, clean,
       array_to_string(list_filter(string_split(clean, ' '),
                                   t -> t NOT IN ('the', 'a', 'of', 'and', 'is')),
                       ' ') AS no_stop
FROM norm
"""


@register("text_normalize", oracle=NORMALIZE_SQL, covers=["P7"])
def q_text_normalize(spark, sf_dir):
    """C4-style text normalization + stopword removal as pure Column
    expressions (lowercase, control-char strip, whitespace collapse,
    trim; then exact-token stopword filter). Mixed-case/tab/padding
    noise is injected in-query so the cleaning has work to do."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    noisy = F.concat(F.lit("  MiXeD "), F.col("text"), F.lit("\t"), F.lit("End  "))
    clean = T.normalize_text(noisy)
    return docs.select(
        "doc_id",
        clean.alias("clean"),
        T.remove_stopwords(clean).alias("no_stop"),
    )


# Synthetic PII injected in-query (the corpus itself is clean), keyed off
# doc_id so every engine synthesizes the identical byte stream
PII_TEXT_CTE = """
pii_docs AS (
    SELECT doc_id,
           text || CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com for details'
               WHEN 1 THEN ' call 555-867-5309 after hours'
               WHEN 2 THEN ' host 192.168.1.' || CAST(doc_id % 254 + 1 AS VARCHAR)
                          || ' unreachable'
               ELSE '' END AS text
    FROM documents
)
"""

PII_SQL = f"""
WITH {PII_TEXT_CTE},
det AS (
    SELECT doc_id, text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(text, '\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS n_phones,
           len(regexp_extract_all(text,
               '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}')) AS n_ips
    FROM pii_docs
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(n_ips AS BIGINT) AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
               '\\d{{3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g'),
           '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}', '<IP>', 'g') AS clean
FROM det
"""


def _pii_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    suffix = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com for details"),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit(" call 555-867-5309 after hours"))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit(" host 192.168.1."),
                (F.col("doc_id") % 254 + 1).cast("string"),
                F.lit(" unreachable"),
            ),
        )
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))


@register("pii_scrub", oracle=PII_SQL, covers=["P7", "F1"])
def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (emails, phone numbers, IPv4 hosts) as
    pure regexp Column expressions — the privacy-scrub pass of a
    training-data pipeline. Patterns are alternation-free so Java regex
    and RE2 agree; redaction order (email -> phone -> ip) is part of the
    contract. Narrow per-row pass: runs inside the scan project with no
    shuffle."""
    docs = _pii_docs(spark, sf_dir)
    counts = T.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        T.redact_pii(F.col("text")).alias("clean"),
    )


NGRAM_SQL = """
WITH tk AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
),
ng AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(2, len(toks)),
                                 i -> toks[i - 1] || ' ' || toks[i])) AS ngram
    FROM tk WHERE len(toks) >= 2
),
agg AS (
    SELECT ngram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
    FROM ng GROUP BY ngram
)
SELECT ngram, n_occ, n_docs FROM (
    SELECT *, row_number() OVER (ORDER BY n_occ DESC, ngram) AS rn FROM agg
) t WHERE rn <= 50
"""


@register("ngram_stats", oracle=NGRAM_SQL, covers=["A1", "A2"])
def q_ngram_stats(spark, sf_dir):
    """Top-50 corpus bigrams with occurrence and document frequencies.
    The n-gram expansion is a narrow array transform + explode; both
    counts partially aggregate map-side; the final top-k sorts only the
    vocabulary^2-sized aggregate (tiny next to the corpus), not the
    corpus itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = docs.select(F.explode(T.ngrams(F.col("text"), 2)).alias("ngram"), "doc_id")
    agg = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    # top-k reduction, not a single-partition global sort (ngram is the
    # tiebreak, so the top-50 cut is total-ordered and deterministic)
    return (
        agg.orderBy(F.col("n_occ").desc(), F.col("ngram"))
        .limit(50)
        .select("ngram", "n_occ", "n_docs")
    )
