"""Pipeline batch 39: corpus-statistics diagnostics and privacy
generalization —

- ``zipf_curve_report``: the Zipf/Heaps diagnostic every tokenizer and
  corpus-health check reads: vocabulary ranked by frequency, rolled up
  into power-of-two rank bins (bin k = ranks [2^k, 2^(k+1))) with
  token counts and mass per bin. A healthy natural-language corpus
  shows mass ~halving per bin; a synthetic or deduplicated corpus
  deviates visibly. No floats and no log(): the bin index comes from
  an unrolled integer comparison ladder, so both engines agree
  bit-for-bit.
- ``kanon_generalize``: k-anonymity enforcement (not just the audit —
  q_pipeline8 audits, this FIXES): quasi-identifier groups smaller
  than k=5 escalate through a deterministic generalization ladder
  (balance decile -> balance sign -> suppressed) until their group
  reaches k; emits each row's chosen level, generalized key and final
  group size. The audit query's counterpart every release pipeline
  needs.

Scale notes: the Zipf ranking windows over DISTINCT tokens
(vocabulary-sized, millions at 100 TB — far below corpus rows; the
single ordered pass over the vocab is the documented cost, same as
vocab_coverage). Generalization is three keyed group-bys (one per
ladder level) joined back by row key — no row ever compares to
another row directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# unrolled power-of-two bin ladder (ranks up to 2^20)
_BIN_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN rank < {1 << (k + 1)} THEN {k}" for k in range(21)
    )
    + " ELSE 21 END"
)

ZIPF_SQL = f"""
WITH toks AS (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents
),
counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY token),
ranked AS (
    SELECT token, c,
           row_number() OVER (ORDER BY c DESC, token) AS rank
    FROM counts
),
binned AS (
    SELECT CAST({_BIN_CASE_SQL} AS BIGINT) AS rank_bin, token, c FROM ranked
)
SELECT rank_bin,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(c) AS BIGINT) AS mass,
       CAST(MAX(c) AS BIGINT) AS max_count,
       CAST(MIN(c) AS BIGINT) AS min_count
FROM binned GROUP BY rank_bin
"""


@register("zipf_curve_report", oracle=ZIPF_SQL, covers=["A2", "O1"])
def q_zipf_curve_report(spark, sf_dir):
    """Zipf curve in power-of-two rank bins: vocab ranked (count DESC,
    token), bin k covers ranks [2^k, 2^(k+1)), per-bin token count and
    frequency mass. Bin assignment is an integer comparison ladder —
    no log(), no floats, bit-identical across engines.

    The vocabulary rank is an exact global row_number computed
    DISTRIBUTIVELY (r11, caught by the cardinality-class plan audit:
    the vocab table is token-keyed — it GROWS with the corpus, so the
    old single-partition rank window was the same scale-killer the r8
    verdict flagged in rfm_segments)."""
    from prosnet_prefect_pipelines_spark.operators.distrank import (
        prefix_sums,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = prefix_sums(
        counts, [F.col("c").desc(), F.col("token").asc()], rn_out="rank"
    )
    binned = ranked.select(
        F.expr(f"CAST({_BIN_CASE_SQL} AS BIGINT)").alias("rank_bin"), "token", "c"
    )
    return binned.groupBy("rank_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("c").cast("long").alias("mass"),
        F.max("c").cast("long").alias("max_count"),
        F.min("c").cast("long").alias("min_count"),
    )


_K = 5

KANON_SQL = f"""
WITH base AS (
    SELECT c_custkey, c_mktsegment AS seg, c_nationkey AS nation,
           CAST(least(greatest(floor(c_acctbal / 1000), -1), 9) AS BIGINT) AS bal_l0,
           CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS bal_l1
    FROM customer
),
g0 AS (
    SELECT seg, nation, bal_l0, CAST(COUNT(*) AS BIGINT) AS k0
    FROM base GROUP BY seg, nation, bal_l0
),
g1 AS (
    SELECT seg, nation, bal_l1, CAST(COUNT(*) AS BIGINT) AS k1
    FROM base GROUP BY seg, nation, bal_l1
),
g2 AS (
    SELECT seg, nation, CAST(COUNT(*) AS BIGINT) AS k2
    FROM base GROUP BY seg, nation
)
SELECT b.c_custkey, b.seg, b.nation,
       CASE WHEN g0.k0 >= {_K} THEN 0
            WHEN g1.k1 >= {_K} THEN 1
            ELSE 2 END AS level,
       CASE WHEN g0.k0 >= {_K} THEN 'decile:' || CAST(b.bal_l0 AS VARCHAR)
            WHEN g1.k1 >= {_K} THEN 'sign:' || CAST(b.bal_l1 AS VARCHAR)
            ELSE '*' END AS bal_generalized,
       CASE WHEN g0.k0 >= {_K} THEN g0.k0
            WHEN g1.k1 >= {_K} THEN g1.k1
            ELSE g2.k2 END AS group_k
FROM base b
JOIN g0 ON g0.seg = b.seg AND g0.nation = b.nation AND g0.bal_l0 = b.bal_l0
JOIN g1 ON g1.seg = b.seg AND g1.nation = b.nation AND g1.bal_l1 = b.bal_l1
JOIN g2 ON g2.seg = b.seg AND g2.nation = b.nation
"""


@register("kanon_generalize", oracle=KANON_SQL, covers=["A2", "J1", "P7"])
def q_kanon_generalize(spark, sf_dir):
    """k-anonymity generalization ladder: each customer's balance
    attribute is released at the finest level whose quasi-identifier
    group (segment, nation, balance-at-level) reaches k=5 — decile,
    then sign, then suppressed. Per-level group sizes are window
    counts keyed by the generalized tuple; the row picks its level
    with a CASE — three keyed aggregations, zero row-vs-row logic.
    Note: rows whose level-1 group is still small release '*' with the
    (seg, nation) group size — residual small g2 groups are the
    audit's (q_pipeline8) remit."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nation"),
        F.expr(
            "CAST(least(greatest(floor(c_acctbal / 1000), -1), 9) AS BIGINT)"
        ).alias("bal_l0"),
        F.when(F.col("c_acctbal") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bal_l1"),
    )
    w0 = Window.partitionBy("seg", "nation", "bal_l0")
    w1 = Window.partitionBy("seg", "nation", "bal_l1")
    w2 = Window.partitionBy("seg", "nation")
    sized = base.select(
        "*",
        F.count(F.lit(1)).over(w0).cast("long").alias("k0"),
        F.count(F.lit(1)).over(w1).cast("long").alias("k1"),
        F.count(F.lit(1)).over(w2).cast("long").alias("k2"),
    )
    return sized.select(
        "c_custkey",
        "seg",
        "nation",
        F.when(F.col("k0") >= _K, F.lit(0))
        .when(F.col("k1") >= _K, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("level"),
        F.when(F.col("k0") >= _K, F.concat(F.lit("decile:"), F.col("bal_l0").cast("string")))
        .when(F.col("k1") >= _K, F.concat(F.lit("sign:"), F.col("bal_l1").cast("string")))
        .otherwise(F.lit("*"))
        .alias("bal_generalized"),
        F.when(F.col("k0") >= _K, F.col("k0"))
        .when(F.col("k1") >= _K, F.col("k1"))
        .otherwise(F.col("k2"))
        .cast("long")
        .alias("group_k"),
    )
