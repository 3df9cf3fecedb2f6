"""Hot-bucket stress for the bucket_cap skew guards
(embedding_cosine_pairs and minhash_lsh_pairs).

The adversarial input for sign-LSH dedup is a near-duplicate FLOOD: many
vectors sharing one signature bucket (duplicated embeddings, zero
vectors). Without a cap, the within-bucket self-join runs quadratic in
the flood size; with bucket_cap=C, the flood salts into ceil(size/C)
sub-buckets of ~C each and candidate generation is bounded at
~size*C/2 regardless of how hot the bucket is.

This script builds a corpus of N random vectors where FLOOD of them are
one identical vector, then measures candidate-pair counts and wall time
capped vs uncapped. Reproduce: python scripts/stress_hot_bucket.py
(results recorded in SCALE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def corpus(spark, n: int, flood: int, dim: int):
    """ids [0, flood) share ONE exact vector (the hot bucket); the rest
    are deterministic pseudo-random."""
    base = spark.range(n)
    rand = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) / 1000.0 - 1.0
        ).cast("float"),
    )
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (F.lit(1.0) / (d + 1)).cast("float"),
    )
    return base.select(
        "id", F.when(F.col("id") < flood, hot).otherwise(rand).alias("v")
    )


def doc_corpus(spark, n: int, flood: int):
    """ids [0, flood) share ONE exact text (every band collides); the
    rest are distinct pseudo-random token strings."""
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{i}_"), F.pmod(F.xxhash64("id", F.lit(i)), F.lit(5000)))
            for i in range(12)
        ],
    )
    return spark.range(n).select(
        "id",
        F.when(
            F.col("id") < flood,
            F.lit("the same flooded document text repeated verbatim body"),
        )
        .otherwise(uniq)
        .alias("text"),
    )


def stress_minhash(spark) -> None:
    """Duplicate-flood stress for minhash_lsh_pairs' band self-join: the
    r4 verdict's 'one remaining quadratic trap in the dedup tier'."""
    from prosnet_prefect_pipelines_spark.operators.dedup import minhash_lsh_pairs

    n, flood = 12_000, 2_000
    df = doc_corpus(spark, n, flood)
    for cap in (None, 64):
        t0 = time.time()
        # threshold=0 keeps every verified candidate; the flood-pair
        # count measures both the quadratic bound and the salted recall
        pairs = minhash_lsh_pairs(
            df, "id", "text", k=3, num_hashes=12, bands=4, threshold=0.0,
            hash_mode="fast", bucket_cap=cap,
        )
        n_pairs = pairs.count()
        n_flood = pairs.filter((F.col("a") < flood) & (F.col("b") < flood)).count()
        print(
            f"minhash cap={cap}: verified_pairs={n_pairs} flood_pairs={n_flood} "
            f"(uncapped flood quadratic = {flood * (flood - 1) // 2}) "
            f"wall={time.time() - t0:.1f}s",
            flush=True,
        )


def main() -> None:
    from prosnet_prefect_pipelines_spark.operators.dedup import (
        embedding_cosine_pairs,
    )
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_hot_bucket")
    stress_minhash(spark)
    dim, n, flood = 64, 30_000, 3_000
    df = corpus(spark, n, flood, dim)

    for cap in (None, 64):
        t0 = time.time()
        # threshold=-1.0 keeps every candidate pair -> the count measures
        # candidate GENERATION, the quantity the cap is meant to bound
        pairs = embedding_cosine_pairs(
            df, "id", "v", dim=dim, threshold=-1.0, planes=8, mode="lsh",
            bucket_cap=cap,
        )
        n_pairs = pairs.count()
        # flood pairs that survived (recall inside the hot bucket)
        n_flood = pairs.filter(
            (F.col("a") < flood) & (F.col("b") < flood)
        ).count()
        print(
            f"cap={cap}: candidates={n_pairs} flood_pairs={n_flood} "
            f"(uncapped flood quadratic = {flood * (flood - 1) // 2}) "
            f"wall={time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
