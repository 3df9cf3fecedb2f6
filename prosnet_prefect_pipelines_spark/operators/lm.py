"""Corpus language-model statistics for quality filtering (north-star
extension): unigram frequency scoring, vocabulary coverage, and a linear
quality classifier — the filtering tier a training-data pipeline runs
between dedup and sampling (CCNet/Gopher-style, re-expressed as exact
relational algebra).

Cross-engine exactness note: the classic perplexity formulation sums
``-log p(token)`` — but libm ``log`` differs in the last ulp between
engines, which breaks value-hash oracles. Every score here is therefore
pure integer/DECIMAL arithmetic on token counts (mean corpus frequency,
rare-token share, integer-weighted features): the ordering information a
filter threshold consumes is the same, and the numbers are bit-identical
on any engine. A float-log perplexity twin is pytest-tier only.

Scale shape: one explode + one (token) aggregation for the frequency
table — token cardinality is millions at 100 TB, far below the corpus
row count, so the doc-score join shuffles on token with AQE free to
broadcast the table when it fits; per-doc reduction is a single
map-side-combined aggregation keyed by doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.textstats import tokens


def unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(token, c): corpus-wide token frequencies. One explode + one agg;
    map-side partial aggregation reduces each partition before the only
    shuffle (keyed by token)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def corpus_freq_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    counts: DataFrame | None = None,
    rare_threshold: int = 2,
) -> DataFrame:
    """Per-doc unigram-frequency statistics — the exact-arithmetic stand-in
    for perplexity filtering:

    - ``n_tokens``
    - ``mean_token_freq``: mean corpus frequency of the doc's tokens
      (low = the doc is made of rare/garbage tokens), DECIMAL-exact
    - ``rare_frac``: share of token occurrences whose corpus frequency
      is <= ``rare_threshold`` (high = OCR noise / mojibake / boilerplate
      hashes)

    ``counts``: pass a precomputed/persisted :func:`unigram_counts` table
    to score a new batch against a reference corpus (the incremental
    shape); default scores the corpus against itself.
    """
    c = counts if counts is not None else unigram_counts(df, text_col)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    scored = toks.join(c, on="token")  # inner: every token exists in counts
    # micro-unit integer division (`div` truncates identically everywhere)
    # instead of decimal division, whose rounding mode is engine-specific
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("_sum_c"),
            F.sum(
                F.when(F.col("c") <= rare_threshold, 1).otherwise(0)
            ).alias("_n_rare"),
        )
        .select(
            "id",
            "n_tokens",
            F.expr(
                "CAST(_sum_c * 1000000 AS DECIMAL(38,0)) div n_tokens"
            ).alias("mean_token_freq_micro"),
            F.expr(
                "CAST(_n_rare * 1000000 AS DECIMAL(38,0)) div n_tokens"
            ).alias("rare_frac_micro"),
        )
    )


def vocab_coverage(df: DataFrame, text_col: str, top_k: int = 100) -> DataFrame:
    """Top-``top_k`` tokens by frequency with cumulative corpus coverage
    (``cum_share``) — the curve that sizes a tokenizer vocabulary.

    The global order-by runs AFTER the aggregation, over token
    cardinality (not corpus rows), and the running sum's window spans
    only the ``top_k`` survivors — the one acceptable single-partition
    window in this module, bounded by a constant. Ties broken by token
    so the output is deterministic.
    """
    # total + top both derive from counts: materialize the (vocab-sized)
    # frequency table once instead of re-running the corpus aggregation
    counts = unigram_counts(df, text_col).localCheckpoint(eager=False)
    total = counts.agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("_t"))
    top = (
        counts.orderBy(F.col("c").desc(), F.col("token"))
        .limit(top_k)
        .join(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("c").desc(), F.col("token"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return top.select(
        "token",
        "c",
        F.sum(F.col("c").cast("decimal(38,0)")).over(w).alias("_cum"),
        "_t",
    ).select(
        "token",
        "c",
        # micro-unit `div`: truncating integer division, engine-portable
        F.expr("CAST(_cum * 1000000 AS DECIMAL(38,0)) div _t").alias(
            "cum_share_micro"
        ),
    )


# integer-weighted linear model over integer text features: the shape of a
# fasttext/logistic quality gate, with exact cross-engine arithmetic.
# weights are per-mille (x1000) so the score stays integral.
DEFAULT_QUALITY_WEIGHTS = {
    "bias": -2000,
    "n_tokens": 10,          # longer docs score higher ...
    "n_long_tokens": 25,     # ... especially with real (>=5 char) words
    "n_digit_tokens": -40,   # digit soup is a spam / table-dump signal
    "n_repeat_tokens": -30,  # immediate-repeat tokens (boilerplate loops)
}


def linear_quality_features(text: Column) -> dict[str, Column]:
    """Integer feature map for :func:`linear_quality_score`."""
    toks = tokens(text)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: (a == b).cast("int"),
    )
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_long_tokens": F.size(F.filter(toks, lambda t: F.length(t) >= 5)).cast("long"),
        "n_digit_tokens": F.size(
            F.filter(toks, lambda t: t.rlike("^[0-9]+$"))
        ).cast("long"),
        "n_repeat_tokens": F.coalesce(
            F.aggregate(pairs, F.lit(0).cast("long"), lambda acc, x: acc + x),
            F.lit(0).cast("long"),
        ),
    }


def linear_quality_score(
    text: Column, weights: dict[str, int] | None = None
) -> Column:
    """w . features + bias, integral (per-mille units). Threshold at 0
    for a keep/drop gate; keep the raw score for calibration curves."""
    w = weights or DEFAULT_QUALITY_WEIGHTS
    feats = linear_quality_features(text)
    score: Column = F.lit(w.get("bias", 0)).cast("long")
    for name, col in feats.items():
        score = score + F.lit(w.get(name, 0)).cast("long") * col
    return score


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 50, min_count: int = 1
) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding merge table -> [(rank, left, right, pair_count)].

    The standard trainer shape (Sennrich et al. '16): the DISTRIBUTED
    work is the word-frequency aggregation (one shuffle, map-side
    combined — at 100 TB the corpus reduces to a dimension-sized vocab);
    the merge loop then runs over that collected vocab on the driver,
    like every production BPE trainer, because each merge depends on the
    previous one (inherently sequential) and the state is vocab-sized,
    not corpus-sized.

    Deterministic: best pair = max count, ties broken lexically.

    ``min_count`` floors the word-frequency table BEFORE the collect:
    on a web-scale corpus the distinct-word tail (hapax legomena, URLs,
    hashes) dwarfs the useful vocabulary, and dropping words below the
    floor keeps the driver state truly vocab-sized. Default 1 = keep
    everything (behavior unchanged at test scale).
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= F.lit(int(min_count)))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in words:
        if r.w:
            vocab[tuple(r.w)] = vocab.get(tuple(r.w), 0) + r.c
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        # deterministic: highest count, then LEXICALLY SMALLEST pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((rank, best[0], best[1], top))
        merged: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + c
        vocab = merged
    return merges


def bpe_segment(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a learned merge table -> (id, n_tokens, n_pieces, pieces).

    Encoding is per-word sequential (merges apply in rank order), so it
    runs as an Arrow-batched ``mapInPandas`` — the documented UDF slow
    path, used exactly where relational operators genuinely cannot
    express the semantics. The merge list is tiny and rides the task
    closure.
    """
    ranked = [(m[1], m[2]) for m in sorted(merges)]

    def encode_word(w: str) -> list[str]:
        sym = list(w)
        for left, right in ranked:
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    id_name, text_name = id_col, text_col

    def part(batches):
        import pandas as pd

        for pdf in batches:
            ids, ntok, npieces, pieces = [], [], [], []
            for rid, text in zip(pdf[id_name], pdf[text_name]):
                ws = [w for w in (text or "").strip().split() if w]
                ps: list[str] = []
                for w in ws:
                    ps.extend(encode_word(w))
                ids.append(rid)
                ntok.append(len(ws))
                npieces.append(len(ps))
                pieces.append(" ".join(ps))
            yield pd.DataFrame(
                {"id": ids, "n_tokens": ntok, "n_pieces": npieces, "pieces": pieces}
            )

    return df.select(id_col, text_col).mapInPandas(
        part, "id long, n_tokens long, n_pieces long, pieces string"
    )
