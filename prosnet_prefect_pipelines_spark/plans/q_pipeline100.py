"""Pipeline batch 100 (north-star extension): lexical diversity &
vocabulary statistics over the documents corpus — Yule's K, Simpson's
repeat-rate diversity, type/token & hapax profile, vocabulary
concentration (Herfindahl + Renyi-2), decile vocabulary growth
(Heaps-curve data points), and token-length moments, all with the
catalog's exact-integer discipline so Spark and DuckDB agree
bit-for-bit.

Exactness conventions (continuing batches 95-99; see catalog.py):
- tokenization is the catalog's portable whitespace split
  (Spark split(trim(text), '\\s+') == DuckDB
  string_split_regex(trim(text), '\\s+')), empty tokens dropped
  explicitly on both sides;
- every statistic reduces to the exact integer sufficient statistics
  N (tokens), V (types), V1/V2 (hapax/dis counts) and F2 = sum f^2 —
  e.g. Yule's K = 1e4 (F2 - N)/N^2 and Simpson D =
  (F2 - N)/(N(N-1)) need no per-m frequency spectrum;
- the one transcendental (Renyi-2 entropy = -ln(F2/N^2)) is a SINGLE
  ln call on one double — the same guarded exposure batch 95's WoE
  took (not a per-row fold);
- vocabulary growth uses each type's FIRST-occurrence document rank
  against exact decile boundaries ceil(k*D/10).

Scale notes: the token-frequency table is one explode + one keyed
aggregation (the corpus-standard shape shared with unigram_lm_score);
every statistic then aggregates the |V|-sized type table. The decile
rank window runs over the |docs| distinct-id table. Nothing joins
token rows to token rows.

Ref semantics: SURVEY §2 A2/O1 text compositions; no reference
counterpart (extensions X-YULESK .. X-TOKLEN).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

_TOKS_CTE = """
toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
freq AS (SELECT token, COUNT(*) AS f FROM tk GROUP BY token)
"""


def _freq(spark, sf_dir):
    """(doc_id, token) exploded + (token, f) frequency table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    freq = tk.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    return tk, freq


# ---------------------------------------------------------------------------
# 1. Yule's K characteristic.

YULESK_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
agg AS (
    SELECT SUM(f) AS n, COUNT(*) AS v,
           SUM(CAST(f AS HUGEINT) * f) AS f2
    FROM freq
)
SELECT CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS vocab,
       round(10000.0 * CAST(f2 - n AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS yules_k
FROM agg
"""
)


@register("yules_k_vocab", oracle=YULESK_SQL, covers=["A2"])
def q_yules_k_vocab(spark, sf_dir):
    """Yule's K = 1e4 (sum_m m^2 V_m - N)/N^2 — the classic
    text-characteristic constant; since sum_m m^2 V_m = sum_types f^2,
    the whole statistic reduces to the exact integers N and F2 with
    ONE double expression.

    One explode + one token-keyed aggregation + a |V|-table fold.

    Ref semantics: SURVEY §2 A2 (extension X-YULESK)."""
    _, freq = _freq(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = freq.agg(
        F.sum("f").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.sum(dec(F.col("f")) * F.col("f")).alias("f2"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab"),
        F.round(
            F.lit(10000.0)
            * (F.col("f2") - F.col("n")).cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("yules_k"),
    )


# ---------------------------------------------------------------------------
# 2. Simpson repeat-rate diversity.

SIMPSON_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
agg AS (
    SELECT SUM(f) AS n, SUM(CAST(f AS HUGEINT) * f) AS f2 FROM freq
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       round(CAST(f2 - n AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
           AS simpson_d,
       round(1.0 - CAST(f2 - n AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
           AS gini_simpson
FROM agg
"""
)


@register("simpson_vocab_diversity", oracle=SIMPSON_SQL, covers=["A2"])
def q_simpson_vocab_diversity(spark, sf_dir):
    """Simpson's D = sum f(f-1)/(N(N-1)) (the probability two random
    tokens are the same type, unbiased form) and its Gini–Simpson
    complement — exact integers F2, N and one shared double expression.

    Ref semantics: SURVEY §2 A2 (extension X-SIMPSOND)."""
    _, freq = _freq(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = freq.agg(
        F.sum("f").alias("n"),
        F.sum(dec(F.col("f")) * F.col("f")).alias("f2"),
    )
    nd = F.col("n").cast("double")
    d = (F.col("f2") - F.col("n")).cast("double") / (nd * (nd - F.lit(1.0)))
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(d, 6).alias("simpson_d"),
        F.round(F.lit(1.0) - d, 6).alias("gini_simpson"),
    )


# ---------------------------------------------------------------------------
# 3. Type/token & hapax profile.

TTR_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
agg AS (
    SELECT SUM(f) AS n, COUNT(*) AS v,
           SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS v1,
           SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS v2
    FROM freq
)
SELECT CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS vocab,
       CAST(v1 AS BIGINT) AS hapax, CAST(v2 AS BIGINT) AS dis,
       round(CAST(v AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ttr,
       round(CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE), 6) AS hapax_ratio,
       round(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 6) AS guiraud_r
FROM agg
"""
)


@register("ttr_hapax_profile", oracle=TTR_SQL, covers=["A2"])
def q_ttr_hapax_profile(spark, sf_dir):
    """Type-token ratio, hapax/dis legomena counts, hapax share and
    Guiraud's R = V/sqrt(N) — the vocabulary-richness panel; all from
    the exact integers N, V, V1, V2, with fixed double divisions.

    Ref semantics: SURVEY §2 A2 (extension X-TTR-HAPAX)."""
    _, freq = _freq(spark, sf_dir)
    agg = freq.agg(
        F.sum("f").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.sum((F.col("f") == 1).cast("long")).alias("v1"),
        F.sum((F.col("f") == 2).cast("long")).alias("v2"),
    )
    nd, vd = F.col("n").cast("double"), F.col("v").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab"),
        F.col("v1").cast("long").alias("hapax"),
        F.col("v2").cast("long").alias("dis"),
        F.round(vd / nd, 6).alias("ttr"),
        F.round(F.col("v1").cast("double") / vd, 6).alias("hapax_ratio"),
        F.round(vd / F.sqrt(nd), 6).alias("guiraud_r"),
    )


# ---------------------------------------------------------------------------
# 4. Vocabulary concentration: Herfindahl + Renyi-2 entropy.

HHI_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
agg AS (
    SELECT SUM(f) AS n, SUM(CAST(f AS HUGEINT) * f) AS f2 FROM freq
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       round(CAST(f2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS hhi,
       round(-ln(CAST(f2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
           AS renyi2_entropy
FROM agg
"""
)


@register("vocab_concentration", oracle=HHI_SQL, covers=["A2"])
def q_vocab_concentration(spark, sf_dir):
    """Vocabulary concentration: Herfindahl index sum p_i^2 = F2/N^2
    (exact integer ratio) and the Renyi-2 entropy -ln(HHI) — the one
    transcendental in the batch, a SINGLE ln on one double (same
    guarded exposure as batch 95's WoE).

    Ref semantics: SURVEY §2 A2 (extension X-VOCABHHI)."""
    _, freq = _freq(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = freq.agg(
        F.sum("f").alias("n"),
        F.sum(dec(F.col("f")) * F.col("f")).alias("f2"),
    )
    nd = F.col("n").cast("double")
    hhi = F.col("f2").cast("double") / (nd * nd)
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(hhi, 9).alias("hhi"),
        F.round(-F.log(hhi), 6).alias("renyi2_entropy"),
    )


# ---------------------------------------------------------------------------
# 5. Decile vocabulary growth (Heaps-curve data points).

GROWTH_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
dranks AS (
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk
    FROM (SELECT DISTINCT doc_id FROM tk)
),
dd AS (SELECT COUNT(*) AS nd FROM dranks),
first_seen AS (
    SELECT tk.token, MIN(dranks.rk) AS first_rk
    FROM tk JOIN dranks USING (doc_id)
    GROUP BY tk.token
),
bucketed AS (
    SELECT CAST(ceil(CAST(first_rk * 10 AS HUGEINT) * 1.0 / dd.nd)
                AS INT) AS decile,
           COUNT(*) AS new_types
    FROM first_seen, dd GROUP BY 1
)
SELECT decile,
       CAST(new_types AS BIGINT) AS new_types,
       CAST(SUM(new_types) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS vocab_cum
FROM bucketed
ORDER BY decile
"""
)


@register("vocab_growth_deciles", oracle=GROWTH_SQL, covers=["A2", "O1"])
def q_vocab_growth_deciles(spark, sf_dir):
    """Vocabulary growth curve at corpus deciles (the empirical Heaps
    law): rank documents by id, assign each TYPE the decile of its
    first-occurrence document (decile = ceil(10*rk/D), an exact
    integer), count new types per decile and cumulate.

    Doc ranks are an exact global row_number over the |docs|
    distinct-id table computed DISTRIBUTIVELY (r8 verdict item 1: docs
    are unbounded at 100 TB, so the single-partition rank window is
    replaced by the two-pass distributed rank of
    ``operators/distrank.py``, bit-identical for the unique doc_id
    ordering); |docs| comes free from its offset pass. The decile
    cumulation stays a 10-row window. First-occurrence is one
    token-keyed MIN; the rank join is left to AQE (broadcast while the
    rank table is small, shuffle join at scale).

    Ref semantics: SURVEY §2 A2/O1 (extension X-HEAPS-DECILES)."""
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_sums,
    )

    tk, _ = _freq(spark, sf_dir)
    dranks = prefix_sums(
        tk.select("doc_id").distinct(), [F.col("doc_id").asc()], rn_out="rk"
    )
    # |docs| as a broadcast 1-row dim instead of a driver int (r12: the
    # count over the protocol's persisted block keeps the whole plan
    # job-free at construction)
    dd = dranks.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    first_seen = (
        tk.join(dranks, on="doc_id")
        .groupBy("token")
        .agg(F.min("rk").alias("first_rk"))
    )
    bucketed = (
        first_seen.crossJoin(F.broadcast(dd))
        .select(
            F.ceil(
                (F.col("first_rk") * 10).cast("decimal(38,0)")
                * F.lit(1.0)
                / F.col("nd")
            )
            .cast("int")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bucketed.select(
            "decile",
            F.col("new_types").cast("long").alias("new_types"),
            F.sum("new_types").over(w).cast("long").alias("vocab_cum"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# 6. Token-length moments.

TOKLEN_SQL = (
    "WITH "
    + _TOKS_CTE
    + """,
lens AS (SELECT CAST(length(token) AS BIGINT) AS l FROM tk),
agg AS (
    SELECT COUNT(*) AS n, SUM(CAST(l AS HUGEINT)) AS s,
           SUM(CAST(l AS HUGEINT) * l) AS q, MAX(l) AS mx
    FROM lens
)
SELECT CAST(n AS BIGINT) AS n_tokens, CAST(mx AS BIGINT) AS max_len,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_len,
       round(CAST(n * q - s * s AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_len
FROM agg
"""
)


@register("token_length_moments", oracle=TOKLEN_SQL, covers=["A2"])
def q_token_length_moments(spark, sf_dir):
    """Token-length distribution moments: mean and population variance
    from the exact sums S, Q (variance numerator n*Q - S^2 exact), plus
    the max. Character length is engine-portable on this ASCII corpus.

    Ref semantics: SURVEY §2 A2 (extension X-TOKLEN)."""
    tk, _ = _freq(spark, sf_dir)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lens = tk.select(F.length("token").cast("long").alias("l"))
    agg = lens.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("l"))).alias("s"),
        F.sum(dec(F.col("l")) * F.col("l")).alias("q"),
        F.max("l").alias("mx"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.col("mx").cast("long").alias("max_len"),
        F.round(F.col("s").cast("double") / nd, 6).alias("mean_len"),
        F.round(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (nd * nd),
            6,
        ).alias("var_len"),
    )
