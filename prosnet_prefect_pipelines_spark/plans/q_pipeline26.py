"""Pipeline batch 26 (north-star extension): published training-data
quality rules — the Gopher repetition/shape filters (Rae et al. 2021,
"Scaling Language Models", Appendix A) and C4-style line filtering
(Raffel et al. 2020, §2.2) — as narrow, shuffle-light Spark passes.

Already shipped: dup-3-gram fraction (`doc_repetition`), composite
quality score (`text_quality`), PII scrub, language ID. This batch adds
the remaining published signals:

- ``gopher_quality_flags``: per-document pass/fail against the Gopher
  document-shape bounds (word count, mean word length, stopword
  evidence) plus the combined keep verdict.
- ``dup_line_fraction``: fraction of characters inside lines that occur
  more than once in the same document (Gopher's strongest repetition
  signal at line granularity).
- ``top_ngram_char_frac``: fraction of characters covered by the most
  frequent 2-gram (Gopher Table A1's top-n-gram family, n=2).
- ``c4_line_filter``: line-level keep/drop with per-document retention
  stats and the C4 "too few surviving lines" document drop.

Synthetic-corpus honesty: the testdata documents are single-line,
punctuation-free word streams (TESTDATA.md), so "lines" are derived
in-query as deterministic 8-token chunks, and the C4 terminal-
punctuation test is stood in by a portable md5-parity predicate —
the operator shapes (explode -> line-keyed agg -> doc re-agg) are the
real 100 TB shapes; only the line boundary definition is synthetic.
Every fifth document is doubled in-query (as in ``doc_repetition``) so
the repetition signals have real spread instead of being constant.

Scale: every query is scan -> narrow explode -> doc-keyed aggregation.
No joins, no global sorts; work is proportional to corpus token count
and shuffles only on doc_id (and (doc_id, line) for the line counts) —
the same partitioning a 1000-executor corpus scrub would use. Ratios
are emitted as ONE IEEE division of two exact BIGINTs (bit-identical
on both engines, aggregation-order-free).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

_STOPWORDS = ("the", "a", "of", "and", "is")
_LINE_TOKENS = 8


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doubled(docs):
    """Every 5th doc doubled: gives the repetition signals real spread."""
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _toks(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


# shared oracle prelude: every 5th doc doubled, tokens split
_REP_CTE = """
rep AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text ELSE text END AS text
    FROM documents
),
t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM rep
)
"""

# 8-token pseudo-lines via a lateral index explode (DuckDB) — the Spark
# twin uses posexplode(sequence(...)) + slice
_LINES_CTE = f"""
lines AS (
    SELECT t.doc_id, g.i AS line_id,
           array_to_string(list_slice(t.toks, g.i * {_LINE_TOKENS} + 1,
                                      g.i * {_LINE_TOKENS} + {_LINE_TOKENS}), ' ') AS line
    FROM t, LATERAL (
        SELECT UNNEST(generate_series(0,
            CAST(ceil(len(t.toks) / {_LINE_TOKENS}.0) AS BIGINT) - 1)) AS i
    ) g
)
"""


def _lines_df(docs):
    """doc_id, line_id, line — deterministic 8-token pseudo-lines."""
    n_lines = F.ceil(F.size("toks") / F.lit(float(_LINE_TOKENS))).cast("long")
    return (
        docs.select("doc_id", _toks().alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0), n_lines - 1)).alias("line_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("line_id").cast("long").alias("line_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("_i") * _LINE_TOKENS + 1, _LINE_TOKENS), " "
            ).alias("line"),
        )
    )


# --- Gopher document-shape flags ----------------------------------------------------------

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"

GOPHER_FLAGS_SQL = f"""
WITH {_REP_CTE},
s AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(len(array_to_string(toks, '')) AS BIGINT) AS n_word_chars,
           CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS BIGINT) AS n_stop
    FROM t
)
SELECT doc_id, n_words,
       CAST(n_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       n_stop,
       n_words BETWEEN 50 AND 100000 AS word_count_ok,
       n_word_chars BETWEEN 3 * n_words AND 10 * n_words AS mean_len_ok,
       n_stop >= 2 AS stopword_ok,
       (n_words BETWEEN 50 AND 100000)
           AND (n_word_chars BETWEEN 3 * n_words AND 10 * n_words)
           AND n_stop >= 2 AS keep
FROM s
"""


@register("gopher_quality_flags", oracle=GOPHER_FLAGS_SQL, covers=["P7", "A2"])
def q_gopher_quality_flags(spark, sf_dir):
    """Gopher document-shape filter (Rae et al. 2021, Appendix A): word
    count in [50, 100k], mean word length in [3, 10], >=2 stopword hits
    — each flag emitted plus the combined keep verdict. Mean word
    length is tested by integer cross-multiplication (chars between
    3*words and 10*words), so no float threshold exists; the reported
    mean is one IEEE division of two exact counts. Pure narrow pass:
    scan -> per-row expressions, zero shuffles."""
    toks = _toks()
    n_words = F.size(toks).cast("long")
    n_word_chars = F.length(F.array_join(toks, "")).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("long")
    word_count_ok = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    mean_len_ok = (F.col("n_word_chars") >= 3 * F.col("n_words")) & (
        F.col("n_word_chars") <= 10 * F.col("n_words")
    )
    stopword_ok = F.col("n_stop") >= 2
    return (
        _doubled(_docs(spark, sf_dir))
        .select(
            "doc_id",
            n_words.alias("n_words"),
            n_word_chars.alias("n_word_chars"),
            n_stop.alias("n_stop"),
        )
        .select(
            "doc_id",
            "n_words",
            (F.col("n_word_chars").cast("double") / F.col("n_words").cast("double")).alias(
                "mean_word_len"
            ),
            "n_stop",
            word_count_ok.alias("word_count_ok"),
            mean_len_ok.alias("mean_len_ok"),
            stopword_ok.alias("stopword_ok"),
            (word_count_ok & mean_len_ok & stopword_ok).alias("keep"),
        )
    )


# --- duplicate-line character fraction ----------------------------------------------------

DUP_LINE_SQL = f"""
WITH {_REP_CTE}, {_LINES_CTE},
per AS (
    SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(length(line) AS BIGINT) AS lc
    FROM lines GROUP BY doc_id, line
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN c > 1 THEN c * lc ELSE 0 END) AS BIGINT) AS dup_chars,
       CAST(SUM(c * lc) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN c > 1 THEN c * lc ELSE 0 END) AS DOUBLE)
           / CAST(SUM(c * lc) AS DOUBLE) AS dup_line_char_frac
FROM per GROUP BY doc_id
"""


@register("dup_line_fraction", oracle=DUP_LINE_SQL, covers=["A1", "A2"])
def q_dup_line_fraction(spark, sf_dir):
    """Gopher duplicate-line filter: fraction of characters that sit in
    lines occurring more than once within the document. Explode to
    (doc, line), count per line, re-aggregate per doc — two doc-keyed
    shuffles, no joins; the fraction is one IEEE division of exact
    char counts. Doubled docs surface with frac ~1, clean docs 0."""
    per = (
        _lines_df(_doubled(_docs(spark, sf_dir)))
        .groupBy("doc_id", "line")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn("lc", F.length("line").cast("long"))
    )
    dup = F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("lc")).otherwise(0)).cast("long")
    tot = F.sum(F.col("c") * F.col("lc")).cast("long")
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        dup.alias("dup_chars"),
        tot.alias("total_chars"),
        (dup.cast("double") / tot.cast("double")).alias("dup_line_char_frac"),
    )


# --- top-2-gram character coverage --------------------------------------------------------

TOP_NGRAM_SQL = f"""
WITH {_REP_CTE},
grams AS (
    SELECT t.doc_id,
           t.toks[g.i] || ' ' || t.toks[g.i + 1] AS gram,
           CAST(len(array_to_string(t.toks, ' ')) AS BIGINT) AS doc_chars
    FROM t, LATERAL (
        SELECT UNNEST(generate_series(1, len(t.toks) - 1)) AS i
    ) g
),
counted AS (
    SELECT doc_id, gram, doc_chars, CAST(COUNT(*) AS BIGINT) AS c
    FROM grams GROUP BY doc_id, gram, doc_chars
),
ranked AS (
    SELECT doc_id, gram, doc_chars, c,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
    FROM counted
)
SELECT doc_id, gram AS top_gram, c AS gram_count,
       CAST(c * length(gram) AS BIGINT) AS covered_chars,
       doc_chars,
       CAST(c * length(gram) AS DOUBLE) / CAST(doc_chars AS DOUBLE)
           AS top_gram_char_frac
FROM ranked WHERE rn = 1
"""


@register("top_ngram_char_frac", oracle=TOP_NGRAM_SQL, covers=["A2", "O6"])
def q_top_ngram_char_frac(spark, sf_dir):
    """Gopher top-n-gram filter (n=2): the fraction of document
    characters covered by the single most frequent word bigram. Bigram
    counts aggregate partially map-side; the per-doc argmax is a
    row_number window ordered (count DESC, gram ASC) — the explicit
    tie-break makes the winner deterministic on both engines, where
    max_by/arg_max tie behavior is not. Shuffles on doc_id only."""
    docs = _doubled(_docs(spark, sf_dir)).select(
        "doc_id",
        _toks().alias("toks"),
    )
    grams = docs.select(
        "doc_id",
        F.length(F.array_join("toks", " ")).cast("long").alias("doc_chars"),
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    counted = grams.groupBy("doc_id", "gram", "doc_chars").agg(
        F.count("*").cast("long").alias("c")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("gram"))
    covered = (F.col("c") * F.length("gram")).cast("long")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            F.col("c").alias("gram_count"),
            covered.alias("covered_chars"),
            "doc_chars",
            (covered.cast("double") / F.col("doc_chars").cast("double")).alias(
                "top_gram_char_frac"
            ),
        )
    )


# --- C4-style line filter ------------------------------------------------------------------

# terminal-punctuation stand-in: portable md5 nibble parity (the corpus
# has no punctuation; the predicate column is what's synthetic, not the
# filter/re-agg shape)
_KEEP_LINE = "substr(md5(line), 1, 1) IN ('0','1','2','3','4','5','6','7')"

C4_LINE_SQL = f"""
WITH {_REP_CTE}, {_LINES_CTE},
judged AS (
    SELECT doc_id, line,
           CAST(length(line) AS BIGINT) AS lc,
           (len(string_split_regex(line, '\\s+')) >= 5 AND {_KEEP_LINE}) AS keep_line
    FROM lines
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN keep_line THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
       CAST(SUM(CASE WHEN keep_line THEN lc ELSE 0 END) AS BIGINT) AS kept_chars,
       CAST(SUM(lc) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN keep_line THEN lc ELSE 0 END) AS DOUBLE)
           / CAST(SUM(lc) AS DOUBLE) AS retained_char_frac,
       SUM(CASE WHEN keep_line THEN 1 ELSE 0 END) >= 3 AS keep_doc
FROM judged GROUP BY doc_id
"""


@register("c4_line_filter", oracle=C4_LINE_SQL, covers=["P7", "A2"])
def q_c4_line_filter(spark, sf_dir):
    """C4-style line filtering (Raffel et al. 2020 §2.2): judge each
    line (>=5 words + the terminal-punctuation stand-in), re-aggregate
    survival stats per document, and drop documents with fewer than 3
    surviving lines. One explode + one doc-keyed aggregation; the line
    predicate is a portable md5 parity identical on both engines."""
    keep_line = (
        F.size(F.split(F.col("line"), r"\s+")) >= 5
    ) & F.substring(F.md5(F.col("line")), 1, 1).isin(*"01234567")
    judged = _lines_df(_doubled(_docs(spark, sf_dir))).select(
        "doc_id",
        F.length("line").cast("long").alias("lc"),
        keep_line.alias("keep_line"),
    )
    kept_chars = F.sum(F.when(F.col("keep_line"), F.col("lc")).otherwise(0)).cast("long")
    total_chars = F.sum("lc").cast("long")
    kept_lines = F.sum(F.when(F.col("keep_line"), 1).otherwise(0)).cast("long")
    return judged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        kept_lines.alias("kept_lines"),
        kept_chars.alias("kept_chars"),
        total_chars.alias("total_chars"),
        (kept_chars.cast("double") / total_chars.cast("double")).alias(
            "retained_char_frac"
        ),
        (kept_lines >= 3).alias("keep_doc"),
    )
