"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family (kept fast-but-real;
# every bench query also runs under the correctness gate).
HEADLINE = [
    "pricing_summary",        # groupBy-agg over the fact table
    "person_index_docs",      # flagship bindings->docs pipeline
    "city_index_docs",        # closure semi-join + group_concat + rank-min
    "org_index_docs",         # union branches + values + distinct group_concat
    "bgp_join",               # multi-way triples self-join
    "optional_join",          # left join + pre-filtered agg
    "group_concat",           # sorted collect_list aggregation
    "closure_subclass",       # iterative transitive closure
    "sameas_components",      # connected components fixpoint
    "entity_resolution",      # components + proxy minting
    "render_person_triples",  # 45-template explode renderer
    "dedup_exact",            # hash-groupBy dedup
    "dedup_minhash_lsh",      # shingle->minhash->bands->verify
    "ann_rhp_lsh_topk",       # hyperplane-LSH cosine top-k
    "tumbling_window",        # event-time window agg
    "stream_tumbling_window", # true Structured Streaming (availableNow)
    "asof_join",              # as-of join (union + running-last window)
    "range_join",             # bucketized point-in-interval join
    "session_window",         # sessionization window pass
    "text_quality",           # per-doc text statistics
    "ntriples_serialize",     # RDF writer formatting
    "turtle_serialize",       # prefix-compressed Turtle writer
    "dedup_clusters",         # LSH pairs -> components -> keeper
    "corpus_curation",        # dedup keep + quality gate end-to-end
    "decontaminate_ngrams",   # broadcast n-gram eval-set overlap
    "sample_hash_deterministic",  # key-pure Bernoulli sample
    "pack_sequences",         # sharded token-budget packing
    "salted_aggregate_skew",  # two-phase hot-key aggregation
    "bm25_rank",              # tokenize + broadcast-df BM25 scoring
    "pagerank_nations",       # big-join edge mining + 10 integer PR rounds
    "semdedup_keep",          # k-means + within-cell cosine prune
    "value_quantiles",        # exact nearest-rank quantiles
    "pii_scrub",              # regexp PII redaction (narrow pass)
    "unigram_lm_score",       # token-freq table + token-keyed join + doc agg
    "url_domain_stats",       # regex canonicalize + domain rollup
    "triangle_count",         # degree-ordered wedge join
    "snapshot_diff",          # fingerprint full-outer keyed diff
    "hll_distinct",           # portable HLL registers + harmonic estimate
    "cdc_apply",              # changelog merge, one keyed window
    "record_linkage",         # blocked linkage scoring (levenshtein in blocks)
    "skew_join_salted",       # salt-replicated hot-key join
    "dup_spans_exact",        # cross-doc exact-substring duplication
    "knn_join_batch",         # broadcast-query KNN with local topk prune
    "cusum_drift",            # closed-form CUSUM drift windows
    "scc_components",         # adaptive Tarjan/coloring SCC
    "interval_overlap",       # bucket-grid interval-interval join
    "feature_hashing",        # signed hashing trick vectors
    "sql_tpch_q3",            # TPC-H Q3 via pure spark.sql
    "sql_tpch_q5",            # TPC-H Q5 6-way join via pure spark.sql
    "sql_tpch_q1",            # TPC-H Q1 pricing summary, exact integer cents
    "sql_tpch_q8",            # TPC-H Q8 8-way join market share
    "sql_tpch_q18",           # TPC-H Q18 HAVING semi-join + top-100
    "llm_corpus_pipeline",    # end-to-end dedup->quality->decontam->pack
    "sql_grouping_sets",      # multi-granularity rollup, one Expand + one shuffle
    "sql_exists_antijoin",    # EXISTS/NOT EXISTS -> semi/anti hash joins
    "sql_lateral_topn",       # per-key top-n with WindowGroupLimit pushdown
    "line_dedup_crossdoc",    # CCNet corpus-global paragraph dedup
    "ccnet_lm_buckets",       # per-lang perplexity-proxy tertiles
    "lpa_communities",        # 2-round label propagation
    "udtf_doc_chunks",        # Python UDTF overlapping RAG chunker
    "group_split_no_leakage", # cluster-keyed leakage-proof split
    "winnowing_fingerprints", # MOSS winnowing (explode + encoded argmin)
    "dsir_importance_scores", # broadcast hashed-ngram importance ratio
    "stream_corpus_curation", # stream-static dedup + gate (availableNow)
    "scd2_pit_join",          # point-in-time dimension merge window
    "training_order_shuffle", # epoch-varying shard-windowed shuffle
    "llm_corpus_pipeline_v2", # 2024 flagship: dedup->gate->buckets->split->epochs->shuffle
    "sql_tpch_q9",            # profit rollup over derived partsupp (6-way join)
    "sql_tpch_q21",           # waiting-supplier EXISTS/NOT EXISTS chain
]


def _prev_round_queries() -> dict[str, float]:
    """Per-query timings from the latest driver-recorded BENCH_r{N}.json,
    so each round's output carries regression deltas against the last."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, dict] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        queries = parsed.get("queries")
        if isinstance(queries, dict) and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), queries)
    return best[1] if best else {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from prosnet_prefect_pipelines_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM/session so the first query doesn't pay startup cost
    spark.range(1).count()

    # hardware calibration: a fixed data-independent Spark computation.
    # Query timings divided by this normalize away host-speed differences
    # between rounds (r2's driver box ran every r1 query uniformly ~2x
    # slower; this field makes that visible instead of arguable).
    t0 = time.time()
    from pyspark.sql import functions as _F

    spark.range(0, 200_000_000, 1, 32).agg(
        _F.sum((_F.col("id") % 97).cast("long"))
    ).collect()
    calib = round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        # release checkpointed RDD blocks from iterative operators: dropped
        # Python refs only free JVM-side cache blocks after both GCs run,
        # and accumulated blocks degrade later queries
        del df
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib_spark_agg_sec": calib,
        # host-speed-normalized total: wall divided by the fixed
        # calibration computation, for fair cross-round comparison when
        # rounds run on differently-loaded boxes
        "value_per_calib": round(total / calib, 2) if calib else None,
    }
    prev = _prev_round_queries()
    if prev:
        out["deltas"] = {
            n: round(t - prev[n], 3) for n, t in timings.items() if n in prev
        }
        out["prev_total"] = round(sum(prev.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
