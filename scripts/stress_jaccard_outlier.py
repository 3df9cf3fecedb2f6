"""Giant-document stress for jaccard_verify's set-size cap (r12 item 6).

Builds the sf0.1 dedup corpus PLUS one synthetic outlier document ~100x
the median document length, runs the LSH verify stage guarded (default
cap) and unguarded (cap = 1e9, the r11 array-only path), and records:

- row-level equality of the two results (the guard must not change one
  jaccard value);
- the outlier's shingle-set size vs the median (the row the unguarded
  path would materialize as ONE collect_list buffer);
- how many candidate pairs route to the expansion branch under the
  default cap;
- wall-clock for both runs.

Writes artifacts/stress_jaccard_outlier_r12.json and dumps the guarded
plan (both branches visible under the final Union) to
plans/r12/jaccard_verify_guard_plan.txt.

Usage: python scripts/stress_jaccard_outlier.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.operators import dedup as D
    from prosnet_prefect_pipelines_spark.plans.q_dedup import corpus
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("stress_jaccard_outlier")
    spark.range(1).count()

    base = corpus(spark, sf_dir)
    med_len = base.select(
        F.expr("percentile_approx(length(text), 0.5)").alias("m")
    ).collect()[0].m
    # outlier: ~100x the median document, half overlapping a real doc's
    # vocabulary (so it genuinely collides in LSH buckets), half unique
    seed_text = base.orderBy("id").limit(1).collect()[0].text
    outlier_text = (seed_text + " ") * max(
        1, int(100 * med_len / max(1, len(seed_text)))
    ) + " ".join(f"uniqtok{i}" for i in range(70000))
    outlier_id = 9_999_999
    docs = base.unionByName(
        spark.createDataFrame(
            [(outlier_id, outlier_text)], "id long, text string"
        )
    ).localCheckpoint(eager=True)

    sh = D.shingle_table(docs, "id", "text", k=3)
    sizes = {
        r.id: r.n
        for r in sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("id") == outlier_id)
        .collect()
    }
    med_set = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n")).select(
        F.expr("percentile_approx(n, 0.5)").alias("m")
    ).collect()[0].m

    # candidate pairs from the production LSH stage over the corpus
    pairs = D.minhash_lsh_pairs(
        docs, "id", "text", k=3, num_hashes=12, bands=4,
        threshold=0.0, hash_mode="portable",
    )
    # the verify stage is inside minhash_lsh_pairs; re-run it directly
    # so guarded vs unguarded share the identical candidate input
    # a giant doc rarely collides in LSH buckets (its minhashes are
    # dominated by its unique tail — that is LSH working), so inject
    # explicit (doc, outlier) pairs to force the expansion branch to
    # execute at corpus volume, the way a pathological hot bucket would
    forced = (
        docs.select(F.col("id").alias("a"))
        .filter(F.col("id") % 37 == 0)
        .withColumn("b", F.lit(outlier_id))
    )
    sig_cands = (
        pairs.select("a", "b")
        .unionByName(forced)
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cands = sig_cands.count()
    n_outlier_pairs = sig_cands.filter(
        (F.col("a") == outlier_id) | (F.col("b") == outlier_id)
    ).count()

    def run(cap: int) -> tuple[float, list]:
        t0 = time.time()
        rows = sorted(
            (r.a, r.b, r.jaccard)
            for r in D.jaccard_verify(
                sig_cands, sh, 0.1, max_set_size=cap
            ).collect()
        )
        return round(time.time() - t0, 3), rows

    guarded_s, guarded_rows = run(D._jaccard_set_cap())
    unguarded_s, unguarded_rows = run(10**9)

    out = {
        "sf_dir": sf_dir,
        "median_doc_len": med_len,
        "median_set_size": med_set,
        "outlier_set_size": sizes.get(outlier_id),
        "outlier_vs_median": (
            round(sizes.get(outlier_id, 0) / max(1, med_set), 1)
        ),
        "default_cap": D._jaccard_set_cap(),
        "outlier_capped": sizes.get(outlier_id, 0) > D._jaccard_set_cap(),
        "n_candidate_pairs": n_cands,
        "n_pairs_routed_to_expansion": n_outlier_pairs,
        "rows_guarded": len(guarded_rows),
        "rows_unguarded": len(unguarded_rows),
        "rows_equal": guarded_rows == unguarded_rows,
        "guarded_s": guarded_s,
        "unguarded_s": unguarded_s,
    }
    os.makedirs(os.path.join(_HERE, "artifacts"), exist_ok=True)
    with open(
        os.path.join(_HERE, "artifacts", "stress_jaccard_outlier_r12.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))

    # guarded plan: both branches visible under the final Union
    df = D.jaccard_verify(sig_cands, sh, 0.1)
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    os.makedirs(os.path.join(_HERE, "plans", "r12"), exist_ok=True)
    with open(
        os.path.join(
            _HERE, "plans", "r12", "jaccard_verify_guard_plan.txt"
        ),
        "w",
    ) as fh:
        fh.write(buf.getvalue())


if __name__ == "__main__":
    main()
