"""Pipeline batch 52: code-corpus curation stages — the two scrubs a
source-code training set runs that the text tier didn't cover:

- ``secret_scan``: credential/token detection WITHOUT entropy (logs
  are float-unsafe cross-engine): a token is secret-like when it is
  long (>= 20 chars), mixes character classes (digit + letter), and
  is vowel-poor (< 20% vowels — natural words are vowel-rich, base64/
  hex blobs are not; the integer cross-multiplied test 5*vowels <
  chars is exact). Synthetic honesty (batch-26 convention): every 7th
  doc gets a deterministic fake token appended in-query; the scanner
  itself is generic.
- ``license_detect``: SPDX-style license tagging by phrase match:
  marker phrases are injected into deterministic doc subsets, and the
  detector reports per-license doc counts plus the per-doc first
  match (priority order permissive < copyleft, ties to the more
  restrictive — the conservative compliance rule).

Scale notes: both are narrow per-row scans (token explode + class
counting; LIKE chains) with one keyed rollup each — zero joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

SECRET_SQL = """
WITH aug AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' sk' || CAST(doc_id AS VARCHAR) || 'Xq9Zt3Vb7Nk4Rm2Pw8'
                ELSE text END AS text
    FROM documents
),
toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM aug
),
flagged AS (
    SELECT doc_id, w,
           length(w) >= 20
           AND regexp_matches(w, '[0-9]')
           AND regexp_matches(w, '[A-Za-z]')
           AND 5 * len(list_filter(string_split_regex(lower(w), ''),
                                   ch -> ch IN ('a','e','i','o','u')))
               < length(w) AS is_secret
    FROM toks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN is_secret THEN 1 ELSE 0 END) AS BIGINT) AS n_secrets,
       SUM(CASE WHEN is_secret THEN 1 ELSE 0 END) > 0 AS has_secret
FROM flagged GROUP BY doc_id
"""


@register("secret_scan", oracle=SECRET_SQL, covers=["P7", "A2"])
def q_secret_scan(spark, sf_dir):
    """Secret/token scan: long, class-mixed, vowel-poor tokens flagged
    per doc (the entropy heuristic made exact: 5*vowels < chars).
    Narrow token explode + one doc rollup; the injected fake keys give
    the detector real positives at any sf."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" sk"),
                F.col("doc_id").cast("string"),
                F.lit("Xq9Zt3Vb7Nk4Rm2Pw8"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = aug.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    vowels = F.size(
        F.filter(
            F.split(F.lower("w"), ""),
            lambda ch: ch.isin("a", "e", "i", "o", "u"),
        )
    )
    is_secret = (
        (F.length("w") >= 20)
        & F.col("w").rlike("[0-9]")
        & F.col("w").rlike("[A-Za-z]")
        & (5 * vowels < F.length("w"))
    )
    flagged = toks.select("doc_id", is_secret.alias("is_secret"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("is_secret").cast("long")).cast("long").alias("n_secrets"),
        (F.sum(F.col("is_secret").cast("long")) > 0).alias("has_secret"),
    )


_LICENSES = [
    # (priority, license, marker phrase) — lower priority number wins
    (1, "gpl-3.0", "gnu general public license"),
    (2, "apache-2.0", "apache license version 2"),
    (3, "mit", "mit license"),
]

LICENSE_SQL = """
WITH aug AS (
    SELECT doc_id, lang,
           text || CASE
               WHEN doc_id % 11 = 0 THEN ' mit license grants permission'
               WHEN doc_id % 13 = 0 THEN ' under the apache license version 2'
               WHEN doc_id % 17 = 0 THEN ' gnu general public license applies'
               ELSE '' END AS text
    FROM documents
),
det AS (
    SELECT doc_id, lang,
           CASE WHEN text LIKE '%gnu general public license%' THEN 'gpl-3.0'
                WHEN text LIKE '%apache license version 2%' THEN 'apache-2.0'
                WHEN text LIKE '%mit license%' THEN 'mit'
                ELSE 'unknown' END AS license
    FROM aug
)
SELECT license,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM det GROUP BY license
"""


@register("license_detect", oracle=LICENSE_SQL, covers=["P7", "A2", "O6"])
def q_license_detect(spark, sf_dir):
    """License tagging by marker phrase with conservative priority
    (copyleft matches win over permissive when a file carries both) —
    per-license doc counts. Injected markers (every 11th/13th/17th doc)
    give all branches real members; the detector is a narrow CASE-LIKE
    chain, one rollup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" mit license grants permission")))
        .when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" under the apache license version 2")))
        .when(F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" gnu general public license applies")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    lic = (
        F.when(F.col("text").contains("gnu general public license"), F.lit("gpl-3.0"))
        .when(F.col("text").contains("apache license version 2"), F.lit("apache-2.0"))
        .when(F.col("text").contains("mit license"), F.lit("mit"))
        .otherwise(F.lit("unknown"))
    )
    det = aug.select("doc_id", lic.alias("license"))
    return det.groupBy("license").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )
