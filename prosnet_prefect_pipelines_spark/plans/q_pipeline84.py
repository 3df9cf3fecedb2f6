"""Pipeline batch 84 (north-star extension): robustness corners — the
dirty-data and semantic edge cases engines disagree on when nobody
pins them: homoglyph (mixed-script) detection, aggregate NULL
semantics, overflow-safe wide sums, empty-group semantics, and binary
collation order.

Each query plants its own adversarial data in-query (deterministic,
same construction both engines) so the corner actually fires at every
scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# homoglyph / mixed-script detection.

CONFUSABLE_SQL = """
WITH src AS (
    -- every 10th name gets its 'A' replaced by Cyrillic А (U+0410)
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 10 = 0
                THEN replace(n_name, 'A', 'А') ELSE n_name END AS name
    FROM nation
)
SELECT n_nationkey, name,
       CAST(CASE WHEN regexp_matches(name, '[Ѐ-ӿ]')
                 THEN 1 ELSE 0 END AS INT) AS has_cyrillic,
       CAST(CASE WHEN regexp_matches(name, '[A-Za-z]')
                      AND regexp_matches(name, '[Ѐ-ӿ]')
                 THEN 1 ELSE 0 END AS INT) AS mixed_script,
       CAST(length(name) AS BIGINT) AS n_chars
FROM src
"""


@register("unicode_confusables_audit", oracle=CONFUSABLE_SQL, covers=["P2", "P7"])
def q_unicode_confusables_audit(spark, sf_dir):
    """Homoglyph audit: names with a planted Cyrillic А (U+0410 — the
    Latin-A lookalike) flagged by script-range regex, plus the
    mixed-script flag that catches spoofed identifiers — the IDN/
    account-name confusable screen. Unicode CHARACTER length (not
    bytes) is asserted alongside, pinning both engines' regex ranges
    and length semantics on non-ASCII data."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    name = F.when(
        F.col("n_nationkey") % 10 == 0,
        F.replace(F.col("n_name"), F.lit("A"), F.lit("А")),
    ).otherwise(F.col("n_name"))
    src = nation.select("n_nationkey", name.alias("name"))
    return src.select(
        "n_nationkey",
        "name",
        F.when(F.col("name").rlike("[Ѐ-ӿ]"), 1)
        .otherwise(0)
        .cast("int")
        .alias("has_cyrillic"),
        F.when(
            F.col("name").rlike("[A-Za-z]")
            & F.col("name").rlike("[Ѐ-ӿ]"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("mixed_script"),
        F.length("name").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# aggregate NULL semantics.

NULL_AGG_SQL = """
WITH src AS (
    SELECT n_regionkey,
           CASE WHEN n_nationkey % 3 = 0 THEN NULL
                ELSE CAST(n_nationkey AS BIGINT) END AS v
    FROM nation
)
SELECT n_regionkey,
       CAST(COUNT(*) AS BIGINT) AS count_star,
       CAST(COUNT(v) AS BIGINT) AS count_v,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(MIN(v) AS BIGINT) AS min_v,
       CAST(SUM(COALESCE(v, 0)) AS BIGINT) AS sum_coalesced,
       CAST(CASE WHEN COUNT(v) = 0 THEN NULL
                 ELSE SUM(v) * 1000000 // COUNT(v) END AS BIGINT)
           AS mean_micro_null_skipping
FROM src GROUP BY n_regionkey
"""


@register("null_aggregate_semantics", oracle=NULL_AGG_SQL, covers=["A2", "P7"])
def q_null_aggregate_semantics(spark, sf_dir):
    """Aggregate NULL semantics pinned: COUNT(*) counts rows, COUNT(v)
    and SUM/MIN skip NULLs, COALESCE-then-SUM treats them as zero, and
    the null-skipping mean divides by the NON-NULL count — the five
    spellings that silently produce different numbers on dirty
    columns, proven identical across engines."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    v = F.when(F.col("n_nationkey") % 3 == 0, None).otherwise(
        F.col("n_nationkey").cast("long")
    )
    src = nation.select("n_regionkey", v.alias("v"))
    return src.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("long").alias("count_star"),
        F.count("v").cast("long").alias("count_v"),
        F.sum("v").cast("long").alias("sum_v"),
        F.min("v").cast("long").alias("min_v"),
        F.sum(F.coalesce(F.col("v"), F.lit(0))).cast("long").alias("sum_coalesced"),
        F.expr(
            "CAST(CASE WHEN COUNT(v) = 0 THEN NULL "
            "ELSE SUM(v) * 1000000 div COUNT(v) END AS BIGINT)"
        ).alias("mean_micro_null_skipping"),
    )


# ---------------------------------------------------------------------------
# overflow-safe wide sums.

OVERFLOW_SQL = """
WITH src AS (
    -- values near 2^62: any pairwise long addition would overflow
    SELECT 4611686018427387904 + CAST(n_nationkey AS HUGEINT) AS v
    FROM nation
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) // 1000000000 AS BIGINT) AS sum_div_1e9,
       CAST(SUM(v) % 1000000000 AS BIGINT) AS sum_mod_1e9
FROM src
"""


@register("overflow_safe_sums", oracle=OVERFLOW_SQL, covers=["A2"])
def q_overflow_safe_sums(spark, sf_dir):
    """Overflow-safe aggregation: 25 values near 2^62 summed through
    wide decimal/HUGEINT arithmetic — a plain BIGINT sum would overflow
    (and under ANSI mode, fail). The total is emitted as (quotient,
    remainder) mod 1e9 so it fits the output type while pinning every
    bit of the wide sum."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    src = nation.select(
        (
            F.lit(4611686018427387904).cast("decimal(38,0)")
            + F.col("n_nationkey").cast("decimal(38,0)")
        ).alias("v")
    )
    return src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(SUM(v) div 1000000000 AS BIGINT)").alias("sum_div_1e9"),
        F.expr("CAST(SUM(v) % 1000000000 AS BIGINT)").alias("sum_mod_1e9"),
    )


# ---------------------------------------------------------------------------
# empty-group semantics: spine left-joined to facts.

EMPTY_GROUP_SQL = """
WITH spine AS (SELECT r_regionkey AS region FROM region
               UNION ALL SELECT 99 AS region),
facts AS (
    SELECT n_regionkey AS region, CAST(n_nationkey AS BIGINT) AS v FROM nation
)
SELECT s.region,
       CAST(COUNT(f.v) AS BIGINT) AS n,
       CAST(SUM(f.v) AS BIGINT) AS sum_v,
       CAST(COALESCE(SUM(f.v), 0) AS BIGINT) AS sum_v_zerofilled,
       CAST(CASE WHEN COUNT(f.v) = 0 THEN 1 ELSE 0 END AS INT) AS is_empty
FROM spine s LEFT JOIN facts f ON f.region = s.region
GROUP BY s.region
"""


@register("empty_group_semantics", oracle=EMPTY_GROUP_SQL, covers=["J2", "A2", "P7"])
def q_empty_group_semantics(spark, sf_dir):
    """Empty-group semantics: a reporting spine containing a region
    with NO facts (the planted 99) left-joined and aggregated —
    COUNT = 0 but SUM = NULL for the empty group (the dashboard
    zero-vs-null trap), with the COALESCE spelling that zero-fills.
    Both engines must agree on all three columns for the empty row."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    spine = region.select(F.col("r_regionkey").alias("region")).unionAll(
        spark.range(1).select(F.lit(99).cast(region.schema["r_regionkey"].dataType).alias("region"))
    )
    facts = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_regionkey").alias("region"),
        F.col("n_nationkey").cast("long").alias("v"),
    )
    j = spine.join(facts, "region", "left")
    return j.groupBy("region").agg(
        F.count("v").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
        F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("sum_v_zerofilled"),
        F.when(F.count("v") == 0, 1).otherwise(0).cast("int").alias("is_empty"),
    )


# ---------------------------------------------------------------------------
# binary collation order over mixed-case data.

COLLATION_SQL = """
WITH src AS (
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN lower(n_name) ELSE n_name END
               AS name
    FROM nation
),
ranked AS (
    SELECT name, row_number() OVER (ORDER BY name) AS rn
    FROM src
)
SELECT CAST(rn AS BIGINT) AS rn, name FROM ranked WHERE rn <= 8
"""


@register("binary_collation_order", oracle=COLLATION_SQL, covers=["O1", "P2"])
def q_binary_collation_order(spark, sf_dir):
    """Binary (codepoint) collation pinned: mixed-case names sorted —
    every UPPERCASE name precedes every lowercase one under binary
    collation (A=0x41 < a=0x61), which locale-aware collations silently
    reorder. The first 8 rows with their ranks; Spark's default UTF8
    binary ordering against DuckDB's default (also binary) collation."""
    from pyspark.sql.window import Window

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    name = F.when(
        F.col("n_nationkey") % 2 == 0, F.lower(F.col("n_name"))
    ).otherwise(F.col("n_name"))
    src = nation.select(name.alias("name"))
    ranked = src.withColumn(
        "rn", F.row_number().over(Window.orderBy("name"))
    ).filter(F.col("rn") <= 8)
    return ranked.select(F.col("rn").cast("long").alias("rn"), "name")
