"""Training-data pipeline queries, batch 10 (north-star extension):
k-anonymity auditing and deletion-neighborhood fuzzy joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# k-anonymity audit

_KANON_K = 5

KANON_SQL = f"""
WITH quasi AS (
    SELECT c_nationkey AS nat, c_mktsegment AS seg,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
    FROM customer
),
groups AS (
    SELECT nat, seg, bal_bucket, COUNT(*) AS n
    FROM quasi GROUP BY nat, seg, bal_bucket
)
SELECT nat, seg, bal_bucket, CAST(n AS BIGINT) AS group_size
FROM groups WHERE n < {_KANON_K}
"""


@register("k_anonymity_audit", oracle=KANON_SQL, covers=["A2", "P7"])
def q_k_anonymity_audit(spark, sf_dir):
    """X-KANON: k-anonymity audit over the quasi-identifier tuple
    (nation, segment, balance bucket) — groups smaller than k=5 are the
    re-identification risks a privacy review flags before a dataset
    release. One keyed aggregation; the report is group-cardinality
    sized. (The remediation — generalize or suppress — is a second
    pass over just the flagged tuples.)"""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    quasi = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    return (
        quasi.groupBy("nat", "seg", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < _KANON_K)
        .select("nat", "seg", "bal_bucket", F.col("group_size").cast("long"))
    )


# ---------------------------------------------------------------------------
# deletion-neighborhood fuzzy join (edit distance <= 1, linear)

FUZZY_SQL = """
WITH clean AS (
    SELECT c_custkey AS id, substr(c_name, 10, 9) AS key FROM customer
),
dirty AS (
    SELECT c_custkey + 900000 AS id,
           CASE WHEN c_custkey % 3 = 0
                THEN substr(substr(c_name, 10, 9), 1, 4)
                     || substr(substr(c_name, 10, 9), 6)      -- delete char 5
                WHEN c_custkey % 3 = 1
                THEN substr(substr(c_name, 10, 9), 1, 6) || 'X'
                     || substr(substr(c_name, 10, 9), 8)      -- substitute char 7
                ELSE substr(c_name, 10, 9) END AS key,        -- unchanged
           c_custkey AS true_id
    FROM customer
),
-- deletion neighborhood: the string itself + every 1-deletion variant,
-- tagged by deleted position (0 = intact)
cv AS (
    SELECT id, key, p,
           CASE WHEN p = 0 THEN key
                ELSE substr(key, 1, p - 1) || substr(key, p + 1) END AS variant
    FROM clean, unnest(generate_series(0, 9)) t(p)
    WHERE p <= length(key)
),
dv AS (
    SELECT id, key, true_id, p,
           CASE WHEN p = 0 THEN key
                ELSE substr(key, 1, p - 1) || substr(key, p + 1) END AS variant
    FROM dirty, unnest(generate_series(0, 9)) t(p)
    WHERE p <= length(key)
),
cand AS (
    SELECT DISTINCT c.id AS clean_id, d.id AS dirty_id, d.true_id,
           c.key AS ckey, d.key AS dkey
    FROM cv c JOIN dv d ON c.variant = d.variant
)
SELECT clean_id, dirty_id, clean_id = true_id AS is_true_match
FROM cand
WHERE levenshtein(ckey, dkey) <= 1
"""


@register("fuzzy_join_ed1", oracle=FUZZY_SQL, covers=["J1", "J9"])
def q_fuzzy_join_ed1(spark, sf_dir):
    """X-QGRAM-JOIN: edit-distance<=1 join via deletion neighborhoods —
    each key emits itself + its len 1-deletion variants; two keys within
    one edit share a variant, so candidates come from a plain equi-join
    on the variant (linear x (len+1) row inflation, never a cross join)
    and the exact levenshtein check runs only on candidates. The
    scalable fuzzy-matching primitive under typo-tolerant entity
    resolution."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    key9 = F.expr("substr(c_name, 10, 9)")
    clean = cust.select(k.alias("id"), key9.alias("key"))
    dirty = cust.select(
        (k + 900000).alias("id"),
        F.when(
            k % 3 == 0,
            F.expr(
                "substr(substr(c_name, 10, 9), 1, 4) || substr(substr(c_name, 10, 9), 6)"
            ),
        )
        .when(
            k % 3 == 1,
            F.expr(
                "substr(substr(c_name, 10, 9), 1, 6) || 'X' || substr(substr(c_name, 10, 9), 8)"
            ),
        )
        .otherwise(key9)
        .alias("key"),
        k.alias("true_id"),
    )

    def variants(df):
        pos = F.explode(F.sequence(F.lit(0), F.length("key"))).alias("p")
        out = df.select("*", pos)
        return out.select(
            "*",
            F.when(F.col("p") == 0, F.col("key"))
            .otherwise(
                F.concat(
                    F.expr("substr(key, 1, p - 1)"), F.expr("substr(key, p + 1)")
                )
            )
            .alias("variant"),
        )

    cv = variants(clean).select(
        F.col("id").alias("clean_id"), F.col("key").alias("ckey"), "variant"
    )
    dv = variants(dirty).select(
        F.col("id").alias("dirty_id"),
        F.col("key").alias("dkey"),
        "true_id",
        "variant",
    )
    cand = (
        cv.join(dv, on="variant")
        .select("clean_id", "dirty_id", "true_id", "ckey", "dkey")
        .distinct()
    )
    return cand.filter(F.levenshtein("ckey", "dkey") <= 1).select(
        "clean_id", "dirty_id", (F.col("clean_id") == F.col("true_id")).alias("is_true_match")
    )
