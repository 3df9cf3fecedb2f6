"""Pipeline batch 27 (north-star extension): the two CCNet corpus
stages the scrub was still missing (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data"):

- ``line_dedup_crossdoc``: corpus-global paragraph deduplication. Every
  line is keyed across ALL documents; only the first occurrence
  (smallest (doc_id, line_id)) survives, every later copy — typically
  boilerplate or a near-duplicate document's body — is dropped. Emits
  per-document retention stats and the rebuilt text.
- ``ccnet_lm_buckets``: per-language head/middle/tail bucketing by the
  exact-integer perplexity proxy (mean corpus token frequency — high
  mean frequency = low perplexity = ``head``). CCNet assigns each doc
  to a third of its language's distribution; training mixtures then
  oversample ``head``.

Synthetic-corpus honesty: documents are single-line word streams
(TESTDATA.md), so "lines" are the same deterministic 8-token
pseudo-lines batch 26 uses; the duplicated-document population built
into the testdata gives the cross-doc dedup real signal. The operator
shapes are the 100 TB shapes; only the line boundary is synthetic.

Scale notes (100 TB):
- line dedup shuffles once on the line key for keeper election
  (map-side-combined min aggregation, not a sorted window) and once on
  doc_id for reassembly. A pathological hot line (empty string, "—")
  concentrates one reducer: the keeper election is an algebraic MIN so
  AQE skew split handles it; at production scale the line key would be
  a 128-bit hash of the line, not the string itself.
- bucketing never globally sorts documents: thresholds come from a
  cumulative window over DISTINCT (lang, score) rows — score
  cardinality, not corpus cardinality — then broadcast back. Exact
  integer scores make the tertile cuts bit-identical across engines.

Reference context: the reference pipeline has no corpus tier at all
(it is an RDF ETL, `get_data_apis_vanilla.py`); these extend the
engine toward the LLM-training-data workload per the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline26 import (
    _LINE_TOKENS,
    _LINES_CTE,
    _REP_CTE,
    _docs,
    _doubled,
    _lines_df,
    _toks,
)

# --- corpus-global line (paragraph) dedup -------------------------------------------------

LINE_DEDUP_SQL = f"""
WITH {_REP_CTE}, {_LINES_CTE},
keep AS (
    SELECT doc_id, line_id, line,
           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_id) = 1 AS is_first
    FROM lines
),
per AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
           CAST(SUM(length(line)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN is_first THEN length(line) ELSE 0 END) AS BIGINT)
               AS kept_chars,
           string_agg(CASE WHEN is_first THEN line END, ' ' ORDER BY line_id)
               AS kept_text
    FROM keep GROUP BY doc_id
)
SELECT doc_id, n_lines, kept_lines, total_chars, kept_chars,
       CAST(CAST(kept_chars AS HUGEINT) * 1000000 // total_chars AS BIGINT)
           AS retained_micro,
       coalesce(kept_text, '') AS kept_text
FROM per
"""


@register("line_dedup_crossdoc", oracle=LINE_DEDUP_SQL, covers=["A2", "J1", "O6"])
def q_line_dedup_crossdoc(spark, sf_dir):
    """CCNet corpus-global paragraph dedup: a line survives only in the
    document where it first occurs (min (doc_id, line_id) across the
    whole corpus); all later copies are dropped. Keeper election is a
    map-side-combined ``min(struct(doc_id, line_id))`` groupBy on the
    line key — one shuffle, no sorted window over the corpus — joined
    back on the line key (AQE free to skew-split hot lines).
    Reassembly is one doc-keyed aggregation; kept text is rebuilt
    order-preserving via sort_array over (line_id, line) structs so the
    result is deterministic under any row order."""
    lines = _lines_df(_doubled(_docs(spark, sf_dir)))
    keepers = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_id")).alias("first_at")
    )
    marked = lines.join(keepers, "line").select(
        "doc_id",
        "line_id",
        "line",
        (
            (F.col("doc_id") == F.col("first_at.doc_id"))
            & (F.col("line_id") == F.col("first_at.line_id"))
        ).alias("is_first"),
    )
    kept_len = F.when(F.col("is_first"), F.length("line")).otherwise(F.lit(0))
    per = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("is_first").cast("long")).cast("long").alias("kept_lines"),
        F.sum(F.length("line")).cast("long").alias("total_chars"),
        F.sum(kept_len).cast("long").alias("kept_chars"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_first"), F.struct("line_id", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return per.select(
        "doc_id",
        "n_lines",
        "kept_lines",
        "total_chars",
        "kept_chars",
        F.expr(
            "CAST(CAST(kept_chars AS DECIMAL(38,0)) * 1000000 div total_chars AS BIGINT)"
        ).alias("retained_micro"),
        "kept_text",
    )


# --- per-language perplexity-proxy tertile buckets ----------------------------------------

CCNET_BUCKETS_SQL = """
WITH toks AS (
    SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
),
freq AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY lang, token),
scored AS (
    SELECT t.doc_id, t.lang,
           CAST(CAST(SUM(f.c) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
               AS score_micro
    FROM toks t JOIN freq f ON t.lang = f.lang AND t.token = f.token
    GROUP BY t.doc_id, t.lang
),
dist AS (
    SELECT lang, score_micro, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM scored GROUP BY lang, score_micro
),
cum AS (
    SELECT lang, score_micro, cnt,
           SUM(cnt) OVER (PARTITION BY lang ORDER BY score_micro DESC
                          ROWS UNBOUNDED PRECEDING) AS cum_docs,
           SUM(cnt) OVER (PARTITION BY lang) AS n_docs
    FROM dist
),
thr AS (
    SELECT lang,
           MAX(CASE WHEN cum_docs * 3 >= n_docs THEN score_micro END) AS head_thr,
           MAX(CASE WHEN cum_docs * 3 >= 2 * n_docs THEN score_micro END) AS mid_thr
    FROM cum GROUP BY lang
)
SELECT s.doc_id, s.lang, s.score_micro,
       CASE WHEN s.score_micro >= t.head_thr THEN 'head'
            WHEN s.score_micro >= t.mid_thr THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN thr t USING (lang)
"""


@register("ccnet_lm_buckets", oracle=CCNET_BUCKETS_SQL, covers=["A2", "J1", "O1"])
def q_ccnet_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail: per-language tertile assignment by the
    exact-integer perplexity proxy (mean per-language corpus token
    frequency, micro units; higher = more predictable = head). No
    global document sort anywhere: the tertile thresholds come from a
    cumulative-count window over DISTINCT (lang, score) rows — score
    cardinality only — and the per-lang threshold table (4 rows here,
    bounded by #langs x #distinct scores) broadcasts back onto the
    scored docs. Ties at a cut all land in the higher bucket on both
    engines, so the boundary is deterministic without a tiebreak
    column."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", F.explode(_toks()).alias("token")
    )
    freq = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scored = (
        toks.join(freq, ["lang", "token"])
        .groupBy("doc_id", "lang")
        .agg(
            F.expr(
                "CAST(CAST(SUM(c) AS DECIMAL(38,0)) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("score_micro")
        )
        .localCheckpoint(eager=False)  # dist + final join both read it
    )
    dist = scored.groupBy("lang", "score_micro").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("score_micro").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.select(
        "lang",
        "score_micro",
        F.sum("cnt").over(w_cum).alias("cum_docs"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n_docs"),
    )
    thr = cum.groupBy("lang").agg(
        F.max(
            F.when(F.col("cum_docs") * 3 >= F.col("n_docs"), F.col("score_micro"))
        ).alias("head_thr"),
        F.max(
            F.when(F.col("cum_docs") * 3 >= 2 * F.col("n_docs"), F.col("score_micro"))
        ).alias("mid_thr"),
    )
    return scored.join(F.broadcast(thr), "lang").select(
        "doc_id",
        "lang",
        "score_micro",
        F.when(F.col("score_micro") >= F.col("head_thr"), F.lit("head"))
        .when(F.col("score_micro") >= F.col("mid_thr"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
