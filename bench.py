"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE SHORT JSON line (metric/value/unit/sf/calibration/n_queries only —
round 2's full per-query line exceeded the driver's tail capture and was
truncated mid-line, losing the bench to scoring). Per-query timings, deltas
vs the previous round, and a >25%+>0.3s regression gate are written to
BENCH_DETAIL_r{N}.json (and BENCH_DETAIL.json) on disk instead.
"""

from __future__ import annotations

import glob
import json
import os
import re
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

# Regression gate thresholds (vs previous round's per-query timings).
REGRESSION_PCT = 0.25
REGRESSION_ABS_S = 0.3

# Documented quality-for-time trades: when one of these queries exceeds
# the host-normalized gate, the detail file carries the attribution
# instead of an unexplained flag. (VERDICT r2 asked for exactly this:
# recall-gained-per-second recorded next to the regression.)
KNOWN_TRADEOFFS = {
    "ann_rhp_lsh_topk": (
        "r2 added a second hash table + bucket_cap skew salting vs r1's "
        "single-table LSH: ~1.3x residual work buys multi-table recall "
        "(ann_recall_report measures it; the i.i.d. test corpus is the "
        "adversarial case for angle LSH) and a bounded worst-case bucket. "
        "r3 clawed the r2-specific 2.1x regression back to ~host-speed "
        "by dropping the one-shot localCheckpoint and hoisting norms."
    ),
}


def _here() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _latest(pattern: str) -> tuple[int, str] | None:
    """(round_number, path) of the highest-numbered artifact matching pattern."""
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(_here(), pattern)):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    return best


def _prev_round_queries() -> tuple[dict[str, float], str]:
    """Per-query timings from the latest usable PRIOR-round artifact:
    prefer our own BENCH_DETAIL_r{N}.json (always complete), else the
    driver's parsed BENCH_r{N}.json (r2's is null — truncated). The
    current round's own detail file is excluded so a re-run within a
    round still compares against the previous round. ({}, "") if none."""
    this_round = _this_round()
    candidates: list[tuple[int, dict]] = []
    det = _latest("BENCH_DETAIL_r*.json")
    if det and det[0] < this_round:
        try:
            with open(det[1]) as fh:
                q = json.load(fh).get("queries")
            if isinstance(q, dict) and q:
                candidates.append((det[0], q))
        except (OSError, json.JSONDecodeError):
            pass
    for path in glob.glob(os.path.join(_here(), "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        q = parsed.get("queries")
        if isinstance(q, dict) and q:
            candidates.append((int(m.group(1)), q))
    if not candidates:
        return {}, ""
    rnd, q = max(candidates, key=lambda c: c[0])
    return q, f"r{rnd}"


def _this_round() -> int:
    """Round number for the detail artifact: one past the latest driver bench."""
    drv = _latest("BENCH_r*.json")
    return (drv[0] + 1) if drv else 1


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
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
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
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    prev, prev_round = _prev_round_queries()
    deltas = {n: round(t - prev[n], 3) for n, t in timings.items() if n in prev}
    shared_total = round(sum(timings[n] for n in deltas), 3)
    prev_shared_total = round(sum(prev[n] for n in deltas), 3)
    regressions = sorted(
        (
            {"query": n, "prev_s": prev[n], "now_s": timings[n], "delta_s": d}
            for n, d in deltas.items()
            if d > REGRESSION_ABS_S and prev[n] > 0 and d / prev[n] > REGRESSION_PCT
        ),
        key=lambda r: -r["delta_s"],
    )
    # Host-speed attribution: the driver boxes differ in speed between
    # rounds (observed: a ~1.5-1.8x UNIFORM ratio across unrelated
    # trivial queries). The median now/prev ratio over the shared set
    # estimates that host factor; only queries regressing beyond it are
    # CODE regressions. Both lists land in the detail file.
    ratios = sorted(
        timings[n] / prev[n] for n in deltas if prev[n] > 0.05
    )
    host_ratio = round(ratios[len(ratios) // 2], 3) if ratios else 1.0
    regressions_beyond_host = sorted(
        (
            {
                "query": n,
                "prev_s": prev[n],
                "now_s": timings[n],
                "ratio": round(timings[n] / prev[n], 2),
                **(
                    {"documented_tradeoff": KNOWN_TRADEOFFS[n]}
                    if n in KNOWN_TRADEOFFS
                    else {}
                ),
            }
            for n in deltas
            if prev[n] > 0.05
            and timings[n] > prev[n] * host_ratio * (1 + REGRESSION_PCT)
            and timings[n] - prev[n] * host_ratio > REGRESSION_ABS_S
        ),
        key=lambda r: -r["ratio"],
    )

    rnd = _this_round()
    detail = {
        "round": rnd,
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "calib_spark_agg_sec": calib,
        "value_per_calib": round(total / calib, 2) if calib else None,
        "n_queries": len(timings),
        "queries": timings,
        "rows": rows,
        "prev_round": prev_round,
        "deltas_vs_prev": deltas,
        "shared_total": shared_total,
        "prev_shared_total": prev_shared_total,
        "host_speed_ratio_median": host_ratio,
        "regressions": regressions,
        "regressions_beyond_host": regressions_beyond_host,
        "regression_gate": {"pct": REGRESSION_PCT, "abs_s": REGRESSION_ABS_S},
    }
    for fname in (f"BENCH_DETAIL_r{rnd}.json", "BENCH_DETAIL.json"):
        with open(os.path.join(_here(), fname), "w") as fh:
            json.dump(detail, fh, indent=1)
    if regressions:
        print(f"# regressions vs {prev_round}: {json.dumps(regressions)}", file=sys.stderr)

    # FINAL LINE: short and flat — must survive the driver's tail capture.
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "calib_spark_agg_sec": calib,
        "value_per_calib": round(total / calib, 2) if calib else None,
        "shared_vs_prev": (
            {
                "prev": prev_round,
                "now_s": shared_total,
                "prev_s": prev_shared_total,
                "host_speed_ratio_median": host_ratio,
            }
            if deltas
            else None
        ),
        "n_regressions_beyond_host_speed": len(regressions_beyond_host),
        "n_unattributed_regressions": sum(
            1 for r in regressions_beyond_host if "documented_tradeoff" not in r
        ),
        "detail_file": f"BENCH_DETAIL_r{rnd}.json",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
