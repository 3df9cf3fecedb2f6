"""Pipeline batch 34: data-selection tier —

- ``dsir_importance_scores``: DSIR-style importance scoring (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling"): hashed-bigram features (1024 buckets), a smoothed
  target/raw probability-ratio table, per-doc mean feature ratio. The
  target distribution is the ``lang='en'`` sub-corpus. Exactness
  surrogate, same policy as operators/lm.py: the published estimator
  averages ``log(p_tgt/p_raw)``; libm log differs in the last ulp
  across engines, so the catalog query scores with the exact-integer
  probability RATIO in micro units (monotone per feature, identical
  ranking information for thresholding) — pytest carries the float-log
  twin.
- ``epoch_expansion``: data-constrained repetition planning
  (Muennighoff et al. 2023): under-represented sources repeat up to 4
  epochs toward the largest source's share; emits the materialized
  (doc, epoch) training-list rows with exact integer repeat factors.

Scale notes (100 TB): the DSIR feature table is <= 1024 rows —
BROADCAST; scoring is one bigram explode + one broadcast join + one
doc-keyed aggregation (DSIR's actual production shape: the ratio table
is tiny, the corpus pass is embarrassingly parallel). Epoch expansion
is a per-source count + broadcast plan + narrow explode — output rows
scale with the repeat budget, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import _hash48, _hash48_sql

_B = 1024  # feature buckets

_GRAMS_CTE = f"""
t AS (
    SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
),
grams AS (
    SELECT t.doc_id, t.lang,
           {_hash48_sql("t.toks[g.i] || ' ' || t.toks[g.i + 1]", "dsir")} % {_B} AS f
    FROM t, LATERAL (
        SELECT UNNEST(generate_series(1, len(t.toks) - 1)) AS i
    ) g
    WHERE len(t.toks) >= 2
)
"""

DSIR_SQL = f"""
WITH {_GRAMS_CTE},
raw AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS craw FROM grams GROUP BY f),
tgt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ctgt FROM grams WHERE lang = 'en' GROUP BY f),
tot AS (
    SELECT (SELECT SUM(craw) FROM raw) AS traw,
           (SELECT COUNT(*) FROM grams WHERE lang = 'en') AS ttgt
),
ratio AS (
    SELECT r.f,
           CAST(CAST((coalesce(g.ctgt, 0) + 1) AS HUGEINT) * (traw + {_B}) * 1000000
                // (CAST((r.craw + 1) AS HUGEINT) * (ttgt + {_B})) AS BIGINT)
               AS r_micro
    FROM raw r LEFT JOIN tgt g USING (f), tot
)
SELECT gr.doc_id, gr.lang,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(ra.r_micro) // COUNT(*) AS BIGINT) AS score_micro
FROM grams gr JOIN ratio ra ON ra.f = gr.f
GROUP BY gr.doc_id, gr.lang
"""


@register("dsir_importance_scores", oracle=DSIR_SQL, covers=["A2", "J1"])
def q_dsir_importance_scores(spark, sf_dir):
    """DSIR importance scores: hashed-bigram features, add-one-smoothed
    target/raw ratio per bucket (micro units), per-doc mean ratio.
    The <= 1024-row ratio table is built from two feature-keyed
    aggregations and BROADCAST into the scoring pass — one explode, one
    broadcast join, one doc-keyed agg; nothing shuffles on anything
    bigger than the feature id."""
    # opt r11 (guide §2.3/§2.4, the bigram_lm_score shape): the checkpoint
    # used to materialize one row PER BIGRAM OCCURRENCE (doc_id, lang, f)
    # and all four consumers re-scanned that occurrence-sized block. Every
    # downstream value depends only on per-(doc, feature) multiplicities
    # and f has <= 1024 values, so: fan out by doc_id (hashpartitioning on
    # doc_id satisfies the (doc_id, lang, f) clustering — no exchange for
    # the pre-aggregate, and the final per-doc rollup inherits it too),
    # explode once, pre-aggregate to (doc_id, lang, f, cnt) — at most 1024
    # rows per document regardless of document length — and checkpoint
    # THAT. cnt is carried as an occurrence weight; every sum below is
    # occurrence-exact by construction.
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = (
        docs.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("toks"), i),
                        F.element_at(F.col("toks"), i + 1),
                    ),
                )
            ).alias("gram"),
        )
        .select("doc_id", "lang", (_hash48(F.col("gram"), "dsir") % _B).alias("f"))
        .groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds raw, tgt AND the scoring join
    )
    raw = grams.groupBy("f").agg(F.sum("cnt").cast("long").alias("craw"))
    tgt = (
        grams.filter(F.col("lang") == "en")
        .groupBy("f")
        .agg(F.sum("cnt").cast("long").alias("ctgt"))
    )
    tot = raw.agg(F.sum("craw").alias("traw")).crossJoin(
        grams.filter(F.col("lang") == "en").agg(F.sum("cnt").alias("ttgt"))
    )
    ratio = (
        raw.join(tgt, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.expr(
                f"CAST(CAST((coalesce(ctgt, 0) + 1) AS DECIMAL(38,0)) * (traw + {_B})"
                f" * 1000000 div (CAST((craw + 1) AS DECIMAL(38,0)) * (ttgt + {_B}))"
                " AS BIGINT)"
            ).alias("r_micro"),
        )
    )
    return (
        grams.join(F.broadcast(ratio), "f")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.expr(
                "CAST(SUM(CAST(r_micro AS DECIMAL(38,0)) * cnt) div SUM(cnt)"
                " AS BIGINT)"
            ).alias("score_micro"),
        )
    )


_MAX_EPOCHS = 4

EPOCH_SQL = f"""
WITH kept AS (SELECT doc_id, source FROM documents WHERE n_chars >= 300),
per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM kept GROUP BY source
),
mx AS (SELECT MAX(n_docs) AS m FROM per),
plan AS (
    SELECT source, n_docs,
           least(CAST((m + n_docs - 1) // n_docs AS BIGINT), {_MAX_EPOCHS}) AS repeats
    FROM per, mx
)
SELECT d.doc_id, d.source, p.repeats, g.e AS epoch
FROM kept d
JOIN plan p USING (source),
LATERAL (SELECT UNNEST(generate_series(1, p.repeats)) AS e) g
"""


@register("epoch_expansion", oracle=EPOCH_SQL, covers=["A2", "J4", "O2"])
def q_epoch_expansion(spark, sf_dir):
    """Data-constrained repetition plan: each source repeats
    ceil(max_share / share) epochs, capped at 4 (the published
    diminishing-returns bound) — emitted as the materialized (doc,
    epoch) list a training loader consumes. The per-source plan is a
    handful of rows (broadcast); expansion is a narrow
    explode(sequence(1, repeats)) — zero shuffles after the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plan over the quality-gated corpus: the survivors are what the
    # loader can actually serve, and their per-source counts are the
    # unbalanced shares the repetition plan compensates
    kept = docs.filter(F.col("n_chars") >= 300)
    per = kept.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    mx = per.agg(F.max("n_docs").alias("m"))
    plan = per.crossJoin(F.broadcast(mx)).select(
        "source",
        F.least(
            F.expr("CAST((m + n_docs - 1) div n_docs AS BIGINT)"), F.lit(_MAX_EPOCHS)
        ).alias("repeats"),
    )
    return (
        kept.select("doc_id", "source")
        .join(F.broadcast(plan), "source")
        .select(
            "doc_id",
            "source",
            "repeats",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("repeats").cast("long"))
            ).alias("epoch"),
        )
    )
