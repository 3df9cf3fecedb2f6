"""Pipeline batch 116: post-training preference-data preparation —
DPO-style pair construction with margin and length-bias audits.

A preference-tuning pipeline (DPO/RLHF reward modeling) consumes
(prompt, chosen, rejected) pairs mined from scored candidate
completions. Here each (lang, source) document group stands in for one
prompt's candidate set (measured 10-16 docs/group — the completions-
per-prompt shape), and the reward is a deterministic integer proxy
(1000 * distinct-token count - n_chars: rewards lexical diversity,
penalizes padding) so both engines agree bit-for-bit with no model in
the loop. Three queries:

- ``dpo_pair_construction``: per group, chosen = the top-reward
  completion (doc_id tie-break); rejected = up to ``_MAX_REJECTED``
  candidates whose margin (chosen reward - reward) clears
  ``_MIN_MARGIN``, largest margins first — the standard
  top-1-vs-hard-negatives mining shape.
- ``preference_margin_report``: per-group pair counts and exact
  integer margin mass (min/max/sum) — the reward-separation telemetry
  that decides whether a group's pairs are informative.
- ``length_bias_audit``: the classic reward-hacking screen — the
  fraction of pairs whose CHOSEN side is simply longer, plus the exact
  summed length delta. A healthy preference set keeps this fraction
  near chance; a length-correlated reward inflates it.

Scale shapes (100 TB): the only windows are partitioned by the prompt
group, whose size is the per-prompt candidate count (bounded by the
generation fan-out, never by corpus size), so group skew is structural,
not data-sized; pair volume is <= _MAX_REJECTED per group (linear in
prompts); both audits are keyed aggregations with map-side partials
over the pair table. Reference parity: the reference has no
post-training tier — this extends the LLM-data-pipeline extension
family (COVERAGE.md north star), reusing the q_text token conventions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.operators.textstats import tokens
from prosnet_prefect_pipelines_spark.plans.catalog import register

_MIN_MARGIN = 1000
_MAX_REJECTED = 10

# reward = 1000 * |distinct tokens| - n_chars, as one CTE both audits
# and the pair builder share; window ordering is (reward DESC, doc_id)
# and rejected ranking is (margin DESC, doc_id) — deterministic in both
# engines, no doubles anywhere.
_PAIR_CTES = f"""
scored AS (
    SELECT lang, source, doc_id,
           1000 * len(list_distinct(string_split_regex(trim(text), '\\s+')))
               - n_chars AS reward,
           n_chars
    FROM documents
),
chosen AS (
    SELECT lang, source, doc_id AS chosen_id, reward AS chosen_reward,
           n_chars AS chosen_len
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang, source ORDER BY reward DESC, doc_id) AS rn
        FROM scored
    ) t WHERE rn = 1
),
pairs AS (
    SELECT lang, source, chosen_id, rejected_id, margin,
           chosen_len, rejected_len
    FROM (
        SELECT s.lang, s.source, c.chosen_id, s.doc_id AS rejected_id,
               c.chosen_reward - s.reward AS margin,
               c.chosen_len, s.n_chars AS rejected_len,
               row_number() OVER (
                   PARTITION BY s.lang, s.source
                   ORDER BY c.chosen_reward - s.reward DESC, s.doc_id) AS rk
        FROM scored s JOIN chosen c
          ON s.lang = c.lang AND s.source = c.source
        WHERE c.chosen_reward - s.reward >= {_MIN_MARGIN}
    ) t WHERE rk <= {_MAX_REJECTED}
)"""

DPO_PAIRS_SQL = f"""
WITH {_PAIR_CTES}
SELECT lang, source, chosen_id, rejected_id, CAST(margin AS BIGINT) AS margin
FROM pairs
"""


def _scored(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "lang",
        "source",
        "doc_id",
        (
            F.lit(1000) * F.size(F.array_distinct(tokens(F.col("text"))))
            - F.col("n_chars")
        ).cast("long").alias("reward"),
        "n_chars",
    )


def _pairs(spark, sf_dir):
    scored = _scored(spark, sf_dir)
    w1 = Window.partitionBy("lang", "source").orderBy(
        F.col("reward").desc(), "doc_id"
    )
    chosen = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select(
            "lang",
            "source",
            F.col("doc_id").alias("chosen_id"),
            F.col("reward").alias("chosen_reward"),
            F.col("n_chars").alias("chosen_len"),
        )
    )
    w2 = Window.partitionBy("lang", "source").orderBy(
        F.col("margin").desc(), "doc_id"
    )
    return (
        scored.join(chosen, on=["lang", "source"])
        .withColumn("margin", F.col("chosen_reward") - F.col("reward"))
        .filter(F.col("margin") >= _MIN_MARGIN)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= _MAX_REJECTED)
        .select(
            "lang",
            "source",
            "chosen_id",
            F.col("doc_id").alias("rejected_id"),
            F.col("margin").cast("long").alias("margin"),
            "chosen_len",
            F.col("n_chars").alias("rejected_len"),
        )
    )


@register("dpo_pair_construction", oracle=DPO_PAIRS_SQL, covers=["O6", "O1"])
def q_dpo_pair_construction(spark, sf_dir):
    """(prompt group, chosen, rejected, margin) preference pairs:
    top-reward completion vs its hardest (largest-margin) negatives,
    capped per group — windows partition by the prompt group (size =
    generation fan-out, never corpus-scaled)."""
    return _pairs(spark, sf_dir).select(
        "lang", "source", "chosen_id", "rejected_id", "margin"
    )


MARGIN_REPORT_SQL = f"""
WITH {_PAIR_CTES}
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(margin) AS BIGINT) AS min_margin,
       CAST(MAX(margin) AS BIGINT) AS max_margin,
       CAST(SUM(margin) AS BIGINT) AS sum_margin
FROM pairs GROUP BY lang, source
"""


@register("preference_margin_report", oracle=MARGIN_REPORT_SQL,
          covers=["A2", "A1"])
def q_preference_margin_report(spark, sf_dir):
    """Reward-separation telemetry per prompt group: pair count and
    exact integer margin mass (keyed aggregation, map-side partials)."""
    return _pairs(spark, sf_dir).groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("margin").cast("long").alias("min_margin"),
        F.max("margin").cast("long").alias("max_margin"),
        F.sum("margin").cast("long").alias("sum_margin"),
    )


LENGTH_BIAS_SQL = f"""
WITH {_PAIR_CTES}
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
            AS BIGINT) AS n_chosen_longer,
       round(SUM(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
             / (1.0 * COUNT(*)), 6) AS frac_chosen_longer,
       CAST(SUM(chosen_len - rejected_len) AS BIGINT) AS sum_len_delta
FROM pairs
"""


@register("length_bias_audit", oracle=LENGTH_BIAS_SQL, covers=["A2"])
def q_length_bias_audit(spark, sf_dir):
    """Reward-hacking screen: is 'chosen' just 'longer'? Global exact
    counts (one partial+final aggregation over the bounded pair table);
    the fraction is the only double and is rounded identically in both
    engines."""
    p = _pairs(spark, sf_dir)
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("chosen_len") > F.col("rejected_len"), 1).otherwise(0)
        ).cast("long").alias("n_chosen_longer"),
        F.round(
            F.sum(
                F.when(F.col("chosen_len") > F.col("rejected_len"), 1).otherwise(0)
            )
            / (F.lit(1.0) * F.count(F.lit(1))),
            6,
        ).alias("frac_chosen_longer"),
        F.sum(F.col("chosen_len") - F.col("rejected_len")).cast("long").alias(
            "sum_len_delta"
        ),
    )
