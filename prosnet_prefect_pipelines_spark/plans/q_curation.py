"""Corpus-curation queries (north-star extension): deterministic
sampling / splits / packing and the end-to-end curation pipeline a
training-data job actually ships (dedup keep + quality gate + lang tag).

The portable-fraction DuckDB twin mirrors operators/sampling.py's
md5-prefix hash digit-for-digit, so sample membership is compared
value-for-value across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import dedup as D
from prosnet_prefect_pipelines_spark.operators import sampling as S
from prosnet_prefect_pipelines_spark.operators import textstats as T
from prosnet_prefect_pipelines_spark.plans import q_dedup
from prosnet_prefect_pipelines_spark.plans.catalog import register


def _frac_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of sampling.portable_fraction: 48-bit md5 prefix of
    (key || salt) as a uniform [0,1) double."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    return (
        "list_sum(list_transform(generate_series(1, 12), i -> "
        f"CAST(strpos('0123456789abcdef', substr({h}, i, 1)) - 1 AS BIGINT)"
        " * CAST(power(16, 12 - i) AS BIGINT))) / 281474976710656.0"
    )


SAMPLE_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_frac_sql('doc_id')} < 0.25
"""


@register("sample_hash_deterministic", oracle=SAMPLE_SQL, covers=[])
def q_sample_hash(spark, sf_dir):
    """Deterministic Bernoulli sample at 25%: membership is a pure
    function of doc_id (no rand/seed), so the sample survives reruns,
    repartitioning, and engine swaps unchanged — a narrow filter with
    zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return S.hash_sample(docs, "doc_id", 0.25).select("doc_id", "lang", "source")


_STRATA = {"click": 0.5, "purchase": 1.0, "view": 0.1}

STRATIFIED_SQL = f"""
SELECT event_id, event_type FROM events
WHERE {_frac_sql('event_id')} <
      CASE event_type WHEN 'click' THEN 0.5 WHEN 'purchase' THEN 1.0
                      WHEN 'view' THEN 0.1 ELSE 0.0 END
"""


@register("sample_stratified", oracle=STRATIFIED_SQL, covers=[])
def q_sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (reproducible sampleBy): keep
    100% of purchases, 50% of clicks, 10% of views, drop the rest — the
    class-rebalancing shape, as a literal CASE + narrow filter."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return S.stratified_sample(events, "event_id", "event_type", _STRATA).select(
        "event_id", "event_type"
    )


SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN {_frac_sql('doc_id', 'split')} < 0.1 THEN 'test'
            WHEN {_frac_sql('doc_id', 'split')} < 0.2 THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""


@register("train_val_test_split", oracle=SPLIT_SQL, covers=[])
def q_train_val_test_split(spark, sf_dir):
    """Key-pure train/val/test assignment (10/10/80): a document can
    never migrate between splits across reruns or corpus growth — the
    train-eval contamination guard. Salted independently from any
    sampling decision on the same key."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return S.train_val_test(docs, "doc_id", val_frac=0.1, test_frac=0.1).select(
        "doc_id", "split"
    )


PACK_SQL = """
WITH sized AS (
    SELECT doc_id, doc_id % 8 AS shard,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, shard, n_tokens,
           CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum
    FROM sized
)
SELECT doc_id, shard, n_tokens, cum // 512 AS bin, cum % 512 AS bin_offset
FROM c
"""


@register("pack_sequences", oracle=PACK_SQL, covers=[])
def q_pack_sequences(spark, sf_dir):
    """Concat-then-chunk sequence packing into 512-token bins, sharded 8
    ways: each shard packs independently (one window agg per shard, no
    global ordering), so packing parallelizes with the shard count —
    the context-window layout step of an LLM data pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return S.pack_greedy(sized, "shard", "doc_id", "n_tokens", budget=512).select(
        "doc_id", "shard", "n_tokens", "bin", "bin_offset"
    )


# word-3-gram expansion (the dedup shingle shape) over an arbitrary CTE
def _shingle_lateral(src: str, id_expr: str, out_id: str, distinct: bool) -> str:
    d = "DISTINCT " if distinct else ""
    return f"""
    SELECT {d}{id_expr} AS {out_id}, shingle
    FROM (SELECT {id_expr}, string_split_regex(trim(text), '\\s+') AS w FROM {src}) t,
    LATERAL (
        SELECT unnest(
            CASE WHEN len(w) >= 3
                 THEN list_transform(generate_series(1, len(w) - 2),
                                     i -> array_to_string(w[i:i+2], ' '))
                 ELSE [array_to_string(w, ' ')] END
        ) AS shingle
    ) s
"""


DECONTAMINATE_SQL = f"""
WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
tr_sh AS ({_shingle_lateral('documents', 'doc_id', 'train_id', True)}),
ev_sh AS ({_shingle_lateral('ev', 'doc_id', 'eval_id', True)})
SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_common
FROM tr_sh JOIN ev_sh USING (shingle)
GROUP BY train_id, eval_id
HAVING COUNT(*) >= 2
"""


@register("decontaminate_ngrams", oracle=DECONTAMINATE_SQL, covers=["J1"])
def q_decontaminate_ngrams(spark, sf_dir):
    """Benchmark decontamination: training documents sharing >= 2
    distinct word 3-grams with an eval-set document (here: the doc_id
    %97 slice standing in for a held-out benchmark). The eval shingle
    table is broadcast — the training corpus is probed narrowly, never
    shuffled, which is what makes this runnable against 100 TB of
    training text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    return D.ngram_contamination(
        docs, "doc_id", "text", evalset, "doc_id", "text", k=3, min_common=2
    )


REPETITION_SQL = f"""
WITH rep AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text ELSE text END AS text
    FROM documents
),
sh AS ({_shingle_lateral('rep', 'doc_id', 'id', False)}),
per AS (SELECT id, shingle, COUNT(*) AS c FROM sh GROUP BY id, shingle)
SELECT id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       round((SUM(c) - COUNT(*)) / SUM(c), 6) AS dup_ngram_frac
FROM per GROUP BY id
"""


@register("doc_repetition", oracle=REPETITION_SQL, covers=["A1"])
def q_doc_repetition(spark, sf_dir):
    """Intra-document repetition signal (Gopher-style quality filter):
    fraction of 3-gram occurrences that repeat an earlier one. Every
    fifth document is doubled in-query so the signal has real spread.
    One explode + two document-keyed aggregations — work proportional
    to corpus token count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return D.repetition_stats(rep, "doc_id", "text", k=3)


CURATION_SQL = f"""
WITH RECURSIVE {q_dedup.MINHASH_PAIR_CTES}, {q_dedup.COMPONENT_CTES},
kept AS (
    SELECT c.id, c.text
    FROM corpus c LEFT JOIN comps m ON c.id = m.node_id
    WHERE coalesce(m.comp_id, c.id) = c.id
),
t AS (
    SELECT id, text,
           string_split_regex(trim(text), '\\s+') AS toks,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
               AS n_punct
    FROM kept
),
s AS (
    SELECT id, n_chars, len(toks) AS n_tokens, n_punct,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is')))
               AS n_stop
    FROM t
),
scored AS (
    SELECT id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * round(n_stop / n_tokens, 6)
                 + 0.2 * (1 - round(n_punct / n_chars, 6)), 6) AS quality
    FROM s
)
SELECT id, n_tokens, quality FROM scored WHERE quality >= 0.5
"""


@register("corpus_curation", oracle=CURATION_SQL, covers=["J9", "P7"])
def q_corpus_curation(spark, sf_dir):
    """The end-to-end curation pipeline a training-data job ships:
    near-dup removal (MinHash-LSH pairs -> components -> keep only
    cluster keepers) composed with a quality gate — one pass over the
    corpus reusing the shared pair view; the expensive stages (shingle
    explode, K minhashes) are computed once per session+sf."""
    c = q_dedup.corpus(spark, sf_dir)
    keepers = q_dedup.q_dedup_clusters(spark, sf_dir).filter(F.col("keep")).select("id")
    kept = c.join(keepers, "id")
    return (
        kept.select(
            "id",
            T.token_count(F.col("text")).cast("long").alias("n_tokens"),
            T.quality_score(F.col("text")).alias("quality"),
        )
        .filter(F.col("quality") >= 0.5)
    )


# ---------------------------------------------------------------------------
# the full LLM corpus pipeline, end to end

LLM_PIPELINE_SQL = f"""
WITH RECURSIVE {{pair_ctes}}, {{comp_ctes}},
kept AS (
    SELECT c.id, c.text
    FROM corpus c LEFT JOIN comps m ON c.id = m.node_id
    WHERE coalesce(m.comp_id, c.id) = c.id
),
t AS (
    SELECT id, text,
           string_split_regex(trim(text), '\\s+') AS toks,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
               AS n_punct
    FROM kept
),
s AS (
    SELECT id, text, n_chars, len(toks) AS n_tokens, n_punct,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is')))
               AS n_stop
    FROM t
),
survivors AS (
    SELECT id, text,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * round(n_stop / n_tokens, 6)
                 + 0.2 * (1 - round(n_punct / n_chars, 6)), 6) AS quality
    FROM s
    WHERE round(0.4 * least(n_tokens / 100.0, 1.0)
                + 0.4 * round(n_stop / n_tokens, 6)
                + 0.2 * (1 - round(n_punct / n_chars, 6)), 6) >= 0.5
),
ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
sur_sh AS ({{sur_shingles}}),
ev_sh AS ({{ev_shingles}}),
contaminated AS (
    SELECT train_id FROM (
        SELECT train_id, eval_id FROM sur_sh JOIN ev_sh USING (shingle)
        GROUP BY train_id, eval_id HAVING COUNT(*) >= 2
    ) z GROUP BY train_id
),
clean AS (
    SELECT v.* FROM survivors v
    WHERE NOT EXISTS (SELECT 1 FROM contaminated x WHERE x.train_id = v.id)
),
sampled AS (
    SELECT * FROM clean WHERE {{frac}} < 0.8
),
laid AS (
    SELECT id, id % 8 AS shard, n_tokens, quality,
           CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY id % 8 ORDER BY id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum
    FROM sampled
)
SELECT id, CAST(shard AS BIGINT) AS shard, n_tokens, quality,
       cum // 512 AS bin, cum % 512 AS bin_offset
FROM laid
"""


def _llm_pipeline_sql() -> str:
    from prosnet_prefect_pipelines_spark.plans.q_curation import _shingle_lateral

    return LLM_PIPELINE_SQL.format(
        pair_ctes=q_dedup.MINHASH_PAIR_CTES,
        comp_ctes=q_dedup.COMPONENT_CTES,
        sur_shingles=_shingle_lateral("survivors", "id", "train_id", True),
        ev_shingles=_shingle_lateral("ev", "doc_id", "eval_id", True),
        frac=_frac_sql("id", "llm"),
    )


@register("llm_corpus_pipeline", oracle=None, covers=["J9", "J7", "P7", "O1"])
def q_llm_corpus_pipeline(spark, sf_dir):
    """THE end-to-end LLM training-corpus pipeline, one lazy plan:
    near-dup removal (MinHash-LSH pairs -> connected components -> keep
    cluster keepers) -> quality gate (>= 0.5) -> benchmark
    decontamination (drop docs sharing >= 2 word-3-grams with the eval
    slice; the eval shingle table broadcasts, the corpus is never
    shuffled for it) -> deterministic 80% hash sample -> sharded
    512-token sequence packing. Every stage reuses an operator that is
    itself oracle-checked; the composite is hash-checked against the
    single composed SQL below (registered post-import to share CTE
    fragments)."""
    c = q_dedup.corpus(spark, sf_dir)
    keepers = q_dedup.q_dedup_clusters(spark, sf_dir).filter(F.col("keep")).select("id")
    kept = c.join(keepers, "id")
    survivors = (
        kept.select(
            "id",
            "text",
            T.token_count(F.col("text")).cast("long").alias("n_tokens"),
            T.quality_score(F.col("text")).alias("quality"),
        )
        .filter(F.col("quality") >= 0.5)
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    contaminated = (
        D.ngram_contamination(
            survivors, "id", "text", ev, "doc_id", "text", k=3, min_common=2
        )
        .select("train_id")
        .distinct()
        .withColumnRenamed("train_id", "id")
    )
    clean = survivors.join(contaminated, on="id", how="left_anti")
    sampled = S.hash_sample(clean, "id", 0.8, salt="llm")
    packed = S.pack_greedy(
        sampled.withColumn("shard", F.col("id") % 8),
        "shard",
        "id",
        "n_tokens",
        budget=512,
    )
    return packed.select(
        "id",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        "quality",
        "bin",
        F.col("bin_offset").alias("bin_offset"),
    )


# register the composed oracle after both CTE sources are importable
from prosnet_prefect_pipelines_spark.plans import catalog as _catalog  # noqa: E402

_catalog.ORACLES["llm_corpus_pipeline"] = _llm_pipeline_sql()
