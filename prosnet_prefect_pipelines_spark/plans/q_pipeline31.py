"""Pipeline batch 31: leakage-proof dataset splitting — the missing
step between dedup and train/val/test assignment.

``train_val_test_split`` (q_curation) is key-pure per document, but a
corpus with duplicate documents can still leak: two copies of the same
text hash to different splits and the eval set sees training data.
The group-aware split assigns the WHOLE duplicate cluster by its
keeper's hash:

- ``group_split_no_leakage``: per doc — content fingerprint, cluster
  keeper (min doc_id among same-text docs), the group split (keyed on
  the keeper) and the naive split (keyed on the doc) side by side.
- ``split_leakage_audit``: per multi-doc cluster — how many distinct
  splits the naive assignment scatters it across (>1 = leak) vs the
  group assignment (always exactly 1). The query IS the proof that the
  guard works and the naive baseline doesn't.

Scale notes (100 TB): fingerprint is a narrow md5 projection; the
cluster table is one hash-groupBy on the fingerprint (map-side
combined); the split is a pure hash expression — no extra shuffle
beyond the one dedup already pays. The audit aggregates the same
cluster key. Both DuckDB twins reuse the portable md5-prefix fraction
(`q_curation._frac_sql`) digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import sampling as S
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_curation import _frac_sql

# the corpus carries exact duplicates only at sf>=0.1; re-publish every
# 7th doc under a shifted id so duplicate clusters exist at every sf
# (same honesty pattern as batch 26's _doubled) — the dedup/split logic
# itself is oblivious to the augmentation
_GROUPED_CTE = f"""
aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
),
fp AS (SELECT doc_id, md5(text) AS fingerprint FROM aug),
cl AS (
    SELECT fingerprint, MIN(doc_id) AS cluster_rep,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM fp GROUP BY fingerprint
),
assigned AS (
    SELECT f.doc_id, f.fingerprint, c.cluster_rep, c.n_docs,
           CASE WHEN {_frac_sql('c.cluster_rep', 'split')} < 0.1 THEN 'test'
                WHEN {_frac_sql('c.cluster_rep', 'split')} < 0.2 THEN 'val'
                ELSE 'train' END AS split,
           CASE WHEN {_frac_sql('f.doc_id', 'split')} < 0.1 THEN 'test'
                WHEN {_frac_sql('f.doc_id', 'split')} < 0.2 THEN 'val'
                ELSE 'train' END AS naive_split
    FROM fp f JOIN cl c USING (fingerprint)
)
"""

GROUP_SPLIT_SQL = f"""
WITH {_GROUPED_CTE}
SELECT doc_id, fingerprint, cluster_rep, split, naive_split FROM assigned
"""


@register("group_split_no_leakage", oracle=GROUP_SPLIT_SQL, covers=["J9", "J1", "O6"])
def q_group_split_no_leakage(spark, sf_dir):
    """Group-aware train/val/test: every doc inherits its duplicate
    cluster's split, keyed on the cluster keeper (min doc_id per
    content fingerprint) — so no two copies of the same text can land
    on opposite sides of the train/eval boundary. The naive per-doc
    split rides along for comparison. One fingerprint groupBy + one
    fingerprint-keyed join; splits are pure hash expressions (key-pure,
    rerun-stable)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 10000000).alias("doc_id"), "text"
        )
    )
    fp = aug.select("doc_id", F.md5("text").alias("fingerprint"))
    cl = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("cluster_rep"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    joined = fp.join(cl, "fingerprint")
    grouped = S.train_val_test(joined, "cluster_rep", val_frac=0.1, test_frac=0.1)
    naive = S.train_val_test(
        grouped.withColumnRenamed("split", "_gsplit"), "doc_id", 0.1, 0.1
    )
    return naive.select(
        "doc_id",
        "fingerprint",
        "cluster_rep",
        F.col("_gsplit").alias("split"),
        F.col("split").alias("naive_split"),
    )


LEAK_AUDIT_SQL = f"""
WITH {_GROUPED_CTE}
SELECT cluster_rep, n_docs,
       CAST(COUNT(DISTINCT split) AS BIGINT) AS group_splits,
       CAST(COUNT(DISTINCT naive_split) AS BIGINT) AS naive_splits,
       COUNT(DISTINCT naive_split) > 1 AS naive_leaks
FROM assigned
WHERE n_docs > 1
GROUP BY cluster_rep, n_docs
"""


@register("split_leakage_audit", oracle=LEAK_AUDIT_SQL, covers=["J9", "A1", "A2"])
def q_split_leakage_audit(spark, sf_dir):
    """Per duplicate cluster: distinct splits under group vs naive
    assignment. group_splits is 1 by construction (the invariant the
    test asserts); naive_splits > 1 rows are concrete train/eval leaks
    the naive split would have shipped. Same shuffles as the split
    query plus one cluster-keyed aggregation."""
    assigned = q_group_split_no_leakage(spark, sf_dir)
    cl_sizes = assigned.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        assigned.join(cl_sizes, "cluster_rep")
        .filter(F.col("n_docs") > 1)
        .groupBy("cluster_rep", "n_docs")
        .agg(
            F.countDistinct("split").cast("long").alias("group_splits"),
            F.countDistinct("naive_split").cast("long").alias("naive_splits"),
            (F.countDistinct("naive_split") > 1).alias("naive_leaks"),
        )
    )
