"""Text analysis for training-data pipelines (north-star extension):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side); the only shuffle-bearing step is
whatever aggregation the caller adds. Each op is engine-independent
(checked against DuckDB twins in plans/q_text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language (tiny n-gram-free heuristic; the point is
# the distributed shape — swap for fastText/CLD at will behind the same API)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "que", "y", "es"],
}
PUNCT_CLASS = "[.,;:!?]"
FP_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language."""
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; ties resolved in LANG_MARKERS order;
    no hits at all -> 'und' (undetermined)."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties (>=)
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def quality_stats(text: Column) -> dict[str, Column]:
    """Length/token/punctuation/stopword ratio features, all exact."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.round((n_chars - (n_tok - 1)) / n_tok, 6),
        "punct_ratio": F.round(n_punct / n_chars, 6),
        "stopword_ratio": F.round(n_stop / n_tok, 6),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score: penalize very short docs, reward stopword
    presence, penalize punctuation soup. Deterministic rational arithmetic
    rounded at the end."""
    s = quality_stats(text)
    length_term = F.least(s["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * length_term + 0.4 * s["stopword_ratio"] + 0.2 * (1 - s["punct_ratio"]), 6
    )


def normalize_text(text: Column) -> Column:
    """C4-style cleaning as one composed Column expression: lowercase,
    strip control characters, collapse runs of whitespace, trim. Pure
    JVM-side string ops — the narrow first pass of a text pipeline (runs
    inside the scan's project, costs no shuffle)."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[\x00-\x1f\x7f]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def remove_stopwords(text: Column, stopwords: list[str] | None = None) -> Column:
    """Drop exact stopword tokens (default: the en marker set), rejoining
    with single spaces — array filter against a literal array, no UDF."""
    stops = stopwords if stopwords is not None else LANG_MARKERS["en"]
    arr = F.array(*[F.lit(s) for s in stops])
    kept = F.filter(tokens(text), lambda t: ~F.array_contains(arr, t))
    return F.array_join(kept, " ")


def fingerprint(text: Column, mod: int = FP_MOD) -> Column:
    """Order-sensitive polynomial rolling hash over characters:
    acc = (acc*31 + ascii(ch)) mod m — a deterministic document
    fingerprint (rolling-hash family)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )


# PII detection patterns — kept alternation-free and anchored by explicit
# quantifiers so Java regex (Spark) and RE2 (DuckDB) match identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (emails, phone numbers, IPv4 hosts)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).cast("long"),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).cast("long"),
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder. Redaction order
    (email -> phone -> ip) is part of the contract: emails and phones
    consume their digits before the looser IPv4 pattern runs, and the
    DuckDB twin applies the same order."""
    t = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    return F.regexp_replace(t, PII_IPV4, "<IP>")


def ngrams(text: Column, n: int = 2) -> Column:
    """Word n-grams (space-joined) as an array column — empty when the
    document has fewer than n tokens. Pure JVM-side transform over the
    token array; no shuffle, no UDF."""
    toks = tokens(text)
    joined = F.transform(
        F.sequence(F.lit(n), F.size(toks)),
        lambda i: F.array_join(F.slice(toks, i - n + 1, n), " "),
    )
    # CaseWhen evaluates branches lazily per row, so the descending
    # sequence(n, size) that a short doc would produce is never built
    return F.when(F.size(toks) >= n, joined).otherwise(F.array().cast("array<string>"))


def chunk_tokens(
    df, id_col: str, text_col: str, size: int = 64, stride: int = 48
):
    """Split documents into overlapping token windows -> one row per
    chunk: (id, chunk_id, n_tokens, chunk_text). The context-window
    preparation step (RAG indexing, LM training examples): window
    ``chunk_id`` covers tokens [chunk_id*stride, chunk_id*stride+size).

    Deterministic contract: starts = 0, stride, 2*stride, ... while
    start < n_tokens; the last chunk may be shorter than ``size`` (and,
    when stride < size, may be fully contained in its predecessor —
    kept, so chunk counts are a pure function of n_tokens).

    Narrow: tokenize + one posexplode — no shuffle, no UDF; chunk rows
    inflate the corpus by ~size/stride, the expected overlap cost.
    """
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select("id", "_t", F.posexplode(starts).alias("chunk_id", "_start"))
        .select(
            "id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(F.col("_t"), F.col("_start") + 1, size).alias("_chunk"),
        )
        .select(
            "id",
            "chunk_id",
            F.size("_chunk").cast("long").alias("n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def feature_hashing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    salt: str = "fh",
) -> DataFrame:
    """Signed hashing trick (Weinberger et al.) -> (id, bucket, val):
    each token maps to ``portable_hash(token) % n_buckets`` with a
    +/-1 sign drawn from an independent hash bit, and ``val`` sums the
    signs per (document, bucket) — a fixed-width, vocabulary-free
    feature vector for the linear quality tier.

    Sign trick keeps collisions unbiased (E[collision term] = 0). The
    md5-prefix hash is engine-portable (DuckDB twin mirrors it
    digit-for-digit); at 100 TB the explode+groupBy keys on (id,
    bucket) — work linear in corpus tokens, output |docs| x n_buckets
    at most.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.concat(F.col("tok"), F.lit(salt))), 1, 12), 16, 10).cast(
        "long"
    )
    sign_digit = F.substring(F.md5(F.concat(F.col("tok"), F.lit(salt))), 13, 1)
    sign = F.when(sign_digit < F.lit("8"), F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select("id", F.pmod(h, F.lit(n_buckets)).alias("bucket"), sign.alias("s"))
        .groupBy("id", "bucket")
        .agg(F.sum("s").alias("val"))
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 120,
) -> DataFrame:
    """Per-document Shannon character entropy over a bounded prefix —
    the classic low-entropy gate (boilerplate / repeated-char spam) of
    corpus quality filtering.

    Returns (id, n_used, entropy, low_entropy) where entropy is
    sum(-p_c * ln(p_c)) over character frequencies of the first
    ``prefix_len`` characters, each term 6-dp rounded and summed as an
    exact scaled integer (catalog convention: aggregation order can't
    perturb the value, and the BIGINT cast normalizes -0.0 from the
    single-character case). low_entropy flags entropy < 2.5 nats.

    Scale shape: the explode is bounded to ``prefix_len`` rows per doc
    (not the full text) and immediately feeds one keyed count with
    map-side partial aggregation — a narrow pass plus two aggregations,
    no joins.
    """
    pre = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("s"),
    ).filter(F.col("s").isNotNull() & (F.length("s") > 0))
    chars = pre.select(
        "id",
        "s",
        F.length("s").alias("n_used"),
        F.explode(F.sequence(F.lit(1), F.length("s"))).alias("i"),
    ).select("id", "n_used", F.expr("substr(s, i, 1)").alias("ch"))
    cnt = chars.groupBy("id", "n_used", "ch").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") / F.col("n_used").cast("double")
    t6 = F.round(F.round(-p * F.log(p), 6) * 1_000_000, 0).cast("long")
    return (
        cnt.select("id", "n_used", t6.alias("t6"))
        .groupBy("id", "n_used")
        .agg(F.sum("t6").cast("long").alias("e6"))
        .select(
            "id",
            F.col("n_used").cast("long").alias("n_used"),
            (F.col("e6") / F.lit(1_000_000.0)).alias("entropy"),
            ((F.col("e6") / F.lit(1_000_000.0)) < 2.5).alias("low_entropy"),
        )
    )
