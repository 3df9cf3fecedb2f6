"""Streaming-monitor analog of the sf1 relational stress (r10 verdict
item 7): the r21 stress proved the relational tier sub-4x at 10x data;
this script measures the five streaming monitors' availableNow REBUILD
and their checkpoint-resumed SERVING probes at 10x
documents/embeddings/customer volume, using the same key-stride
replication recipe as ``stress_sf1_relational.py``.

Scale-up construction (10x-larger instance of the same distribution,
replica-local structure preserved):

- ``documents``: doc_id shifted by replica * stride; every TEXT TOKEN
  prefixed with a replica tag, so within-replica shingle/Jaccard
  structure is preserved bijectively while cross-replica similarity
  drops to ~0 — without this, 10 identical copies of every text make
  each doc a 10-clique of exact near-dups and the pair volume scales
  ~45x/doc instead of 10x (a DIFFERENT workload, not a bigger one).
- ``embeddings``: vec_id shifted; each component perturbed by
  replica * 1e-3, so vectors are near-but-not-identical across
  replicas (identical copies would make every ANN top-k a degenerate
  tie pile).
- ``customer``: c_custkey shifted (the resolver monitor's stream).
- everything else symlinked unscaled.

Superlinear flag fires at ratio > 2 * replicas on warm/rebuild times —
the scale-killer signature (quadratic pair stages, state blowup).

Usage: python scripts/stress_monitors_10x.py [base_sf_dir] [replicas]
Writes artifacts/stress_monitors_10x.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 1_000_000_000  # above any base id AND the probes' +10M offsets

MONITORS = [
    "stream_neardup_monitor",
    "stream_entity_resolution",
    "stream_ann_topk_monitor",
    "stream_ann_ivfpq_monitor",
    "stream_preference_margin_monitor",
    "stream_length_bias_monitor",  # the r26-flag query rides along
]


def _write_single_file(df, dest: str) -> None:
    """Write df as ONE parquet FILE at dest (not a directory): the
    monitors' ``symlink_stage`` file-stream sources list top-level
    files only, and the base testdata tables are single files — a
    Spark-written directory at the same path streams ZERO rows (the
    bug the first r13 stress run hit: scaled_rows 0 at 0.8 s)."""
    tmp = dest + "_tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


def build_scaled_dir(spark, base: str, replicas: int) -> str:
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    out = private_stage_dir(
        f"monitors10x_{os.path.basename(base.rstrip('/'))}_x{replicas}"
    )
    done_marker = os.path.join(out, "_DONE")
    if os.path.exists(done_marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias(
        "_rep"
    )

    docs = spark.read.parquet(f"{base}/documents.parquet").select("*", reps)
    tag = F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit("_"))
    docs = (
        docs.withColumn(
            "doc_id",
            (F.col("doc_id") + F.col("_rep").cast("long") * F.lit(KEY_STRIDE).cast("long")).cast("long"),
        )
        .withColumn(
            "text",
            F.concat(
                tag, F.regexp_replace(F.col("text"), F.lit(" "), F.concat(F.lit(" "), tag))
            ),
        )
        .drop("_rep")
    )
    _write_single_file(docs, f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet").select("*", reps)
    emb = (
        emb.withColumn(
            "vec_id",
            (F.col("vec_id") + F.col("_rep").cast("long") * F.lit(KEY_STRIDE).cast("long")).cast("long"),
        )
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x: (x + F.col("_rep").cast("float") * F.lit(0.001)).cast(
                    "float"
                ),
            ),
        )
        .drop("_rep")
    )
    _write_single_file(emb, f"{out}/embeddings.parquet")

    cust = spark.read.parquet(f"{base}/customer.parquet").select("*", reps)
    cust = cust.withColumn(
        "c_custkey",
        (F.col("c_custkey") + F.col("_rep").cast("long") * F.lit(KEY_STRIDE).cast("long")).cast("long"),
    ).drop("_rep")
    _write_single_file(cust, f"{out}/customer.parquet")

    for table in (
        "region",
        "nation",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        src = f"{base}/{table}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out}/{table}.parquet")
    open(done_marker, "w").close()
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import (
        get_spark,
        sweep_persistent_rdds,
    )
    from prosnet_prefect_pipelines_spark.streaming.serving import (
        ann_serving_probe,
        ivfpq_serving_probe,
        neardup_serving_probe,
        preference_serving_probe,
        resolver_serving_probe,
    )

    probes = {
        "stream_neardup_monitor": neardup_serving_probe,
        "stream_entity_resolution": resolver_serving_probe,
        "stream_ann_topk_monitor": ann_serving_probe,
        "stream_ann_ivfpq_monitor": ivfpq_serving_probe,
        "stream_preference_margin_monitor": preference_serving_probe,
    }

    spark = get_spark("stress_monitors_10x")
    qs = entry_mod.queries()
    spark.range(1).count()

    t0 = time.time()
    scaled = build_scaled_dir(spark, base, replicas)
    build_s = round(time.time() - t0, 1)
    print(f"# scaled dir {scaled} ready in {build_s}s", file=sys.stderr)

    def timed(name: str, sf_dir: str) -> tuple[float, int]:
        sweep_persistent_rdds(spark)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        return round(time.time() - t0, 3), n

    results = {}
    for name in MONITORS:
        if name not in qs:
            continue
        base_cold, base_rows = timed(name, base)
        base_warm, _ = timed(name, base)
        big_cold, big_rows = timed(name, scaled)
        big_warm, _ = timed(name, scaled)
        ratio = round(big_warm / base_warm, 2) if base_warm else None
        rec = {
            "base_cold_s": base_cold,
            "base_warm_s": base_warm,
            "base_rows": base_rows,
            "scaled_cold_s": big_cold,
            "scaled_warm_s": big_warm,
            "scaled_rows": big_rows,
            "warm_scale_ratio": ratio,
            "superlinear": bool(ratio and ratio > 2 * replicas),
        }
        if name in probes:
            try:
                sweep_persistent_rdds(spark)
                rec["serving_base"] = probes[name](spark, base)
                sweep_persistent_rdds(spark)
                rec["serving_scaled"] = probes[name](
                    spark, scaled, timeout_s=1800
                )
                sb = rec["serving_base"].get("serving_s")
                ss = rec["serving_scaled"].get("serving_s")
                rec["serving_scale_ratio"] = (
                    round(ss / sb, 2) if sb and ss else None
                )
            except Exception as exc:
                rec["serving_error"] = repr(exc)
        results[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)

    artifact = {
        "base_sf_dir": base,
        "replicas": replicas,
        "key_stride": KEY_STRIDE,
        "build_s": build_s,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "queries": results,
        "n_superlinear": sum(
            1 for r in results.values() if r.get("superlinear")
        ),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "artifacts", "stress_monitors_10x.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        json.dumps(
            {
                "artifact": out_path,
                **{
                    k: v.get("warm_scale_ratio") for k, v in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
