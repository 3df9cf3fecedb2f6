"""Stage-level timing of the dedup_minhash_lsh cold path (r11 opt round).

Fresh session; times each stage of the LSH pair build separately by
materializing it (count), so the breakdown attributes the 8.3 s cold
bench number to corpus / shingles / signatures / band self-join /
verify. Optionally re-runs with whole-stage codegen ON to check whether
the interpreted-eval default is costing this expression-dense path.

Usage: python scripts/profile_lsh_r11.py [--wscg]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    if "--wscg" in sys.argv:
        os.environ["SPARK_GRAFT_WSCG"] = "true"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.session import get_spark
    from prosnet_prefect_pipelines_spark.operators import dedup as D
    from prosnet_prefect_pipelines_spark.plans import q_dedup

    spark = get_spark("profile_lsh")
    spark.range(1).count()
    out: dict = {"wscg": os.environ.get("SPARK_GRAFT_WSCG", "false")}

    def t(label, fn):
        t0 = time.time()
        r = fn()
        out[label] = round(time.time() - t0, 3)
        print(f"# {label}: {out[label]}s", file=sys.stderr)
        return r

    corpus = q_dedup._build_corpus(spark, sf_dir).localCheckpoint(eager=False)
    t("corpus_build_count", lambda: corpus.count())

    sh = D.shingle_table(corpus, "id", "text", 3).localCheckpoint(eager=False)
    t("shingles_materialize", lambda: sh.count())

    sig = D.minhash_signatures(corpus, "id", "text", 3, 12, "portable", shingles=sh)
    sigc = sig.localCheckpoint(eager=False)
    t("signatures", lambda: sigc.count())

    r = 3
    band_buckets = F.array(
        *[
            F.concat_ws("_", *[F.col(f"m{b * r + i}").cast("string") for i in range(r)])
            for b in range(4)
        ]
    )
    band_sig = sigc.select("id", F.posexplode(band_buckets).alias("band", "bucket")).localCheckpoint(
        eager=False
    )
    t("band_explode", lambda: band_sig.count())

    cands = (
        band_sig.alias("x")
        .join(band_sig.alias("y"), on=["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    ).localCheckpoint(eager=False)
    t("band_selfjoin_distinct", lambda: cands.count())

    verified = D.jaccard_verify(cands, sh, 0.5)
    t("jaccard_verify", lambda: verified.count())

    # end-to-end, fresh lineage (what the bench pays, minus memo reuse)
    t(
        "end_to_end_fresh",
        lambda: D.minhash_lsh_pairs(
            q_dedup._build_corpus(spark, sf_dir), "id", "text",
            k=3, num_hashes=12, bands=4, threshold=0.5, hash_mode="portable",
        ).count(),
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
