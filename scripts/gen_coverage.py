"""Generate COVERAGE.md: SURVEY §2 operator id -> implementation pointer,
covering catalog queries, oracle status. Run after adding operators."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prosnet_prefect_pipelines_spark.plans import catalog  # noqa: E402

PKG = "prosnet_prefect_pipelines_spark"

# operator id -> (short description, implementation pointer)
INVENTORY: dict[str, tuple[str, str]] = {
    # §2.1 scans/sources
    "S1": ("SPARQL paginated fetch", f"{PKG}/sources/rest_datasource.py (Python DataSource, offset partitions + filter pushdown) + http.py + sparql_bindings.py"),
    "S2": ("SPARQL connection setup", f"{PKG}/sources/http.py (fetch callable injected per task)"),
    "S3": ("SPARQL query rewrite/incremental template", f"{PKG}/streaming/incremental.py (pushed predicate)"),
    "S4": ("REST TTL paginated fetch", f"{PKG}/sources/http.py (paginated_fetch) + rest_datasource.py"),
    "S5": ("Swagger route discovery", f"{PKG}/sources/http.py (driver-side route list feeds offsets)"),
    "S6": ("REST JSON paginated fetch", f"{PKG}/sources/rest_datasource.py + http.py + model.APIS_PERSON_SCHEMA from_json"),
    "S7": ("Batched relation fetch (semi-join pushdown)", f"{PKG}/operators/relational.py (exists_anti_join)"),
    "S8": ("HTTP zip TSV scan (GeoNames)", f"{PKG}/sources/geonames.py"),
    "S9": ("RDF directory load", f"{PKG}/sources/rdf.py (read_rdf_directory)"),
    "S10": ("TTL chunk graph union + named graph", f"{PKG}/sources/rdf.py (named_graph column)"),
    "S11": ("Git clone staging", f"{PKG}/sinks.py (publication_hook; driver-side, out-of-engine)"),
    # §2.2 projections/filters
    "P1": ("Rename / field mapping", f"{PKG}/plans/person_index.py (build_person_docs)"),
    "P2": ("Projection + doc construction", f"{PKG}/sources/geonames.py (build_place_docs)"),
    "P3": ("Id canonicalization", f"{PKG}/functions/scalar.py (wikidata_id_rebuild)"),
    "P4": ("Dynamic postprocess dispatch", f"{PKG}/functions/scalar.py (POSTPROCESSORS registry)"),
    "P5": ("Label creation dispatch", f"{PKG}/functions/scalar.py (LABEL_CREATORS registry)"),
    "P6": ("URL-template filter", f"{PKG}/operators/relational.py (values_join / filter)"),
    "P7": ("Empty/None guards", f"{PKG}/functions/scalar.py (_opt; null-safe expressions throughout)"),
    # §2.3 joins
    "J1": ("BGP inner join", f"{PKG}/operators/relational.py (bgp, triple_pattern)"),
    "J2": ("OPTIONAL = left outer join", f"{PKG}/operators/relational.py (optional_join)"),
    "J3": ("UNION disjunctive patterns", f"{PKG}/operators/relational.py (union_all)"),
    "J4": ("VALUES inline table", f"{PKG}/operators/relational.py (values_join)"),
    "J5": ("Property path closure (wdt:P279*)", f"{PKG}/operators/graph.py (transitive_closure)"),
    "J6": ("Federated label join (lang fallback)", f"{PKG}/operators/relational.py (label_service_join)"),
    "J7": ("Existence anti-join", f"{PKG}/operators/relational.py (exists_anti_join)"),
    "J8": ("Residence propagation join", f"{PKG}/render/entities.py (render_personinstitution_relations J8)"),
    "J9": ("sameAs cluster resolution", f"{PKG}/operators/graph.py (connected_components) + resolve.py"),
    # §2.4 aggregations
    "A1": ("COUNT(DISTINCT)", f"{PKG}/operators/aggregates.py (count_distinct_paginator)"),
    "A2": ("COUNT envelope", f"{PKG}/operators/aggregates.py"),
    "A3": ("GROUP_CONCAT", f"{PKG}/operators/aggregates.py (group_concat)"),
    "A4": ("GROUP_CONCAT(DISTINCT)", f"{PKG}/operators/aggregates.py (group_concat_distinct)"),
    "A5": ("Running total", f"{PKG}/operators/aggregates.py (count at sink; pagination gone)"),
    "A6": ("Triple count", f"{PKG}/operators/aggregates.py"),
    # §2.5 sorts/limits/distinct
    "O1": ("ORDER BY stable key", "plans/q_relational.py (order_limit_topk)"),
    "O2": ("LIMIT/OFFSET pagination", f"{PKG}/operators/relational.py (paginate)"),
    "O3": ("DISTINCT", "plans/q_relational.py (distinct_pairs) + dedup_exact"),
    "O4": ("Python distinct", "same as O3 (select().distinct())"),
    "O5": ("UNION bag semantics", f"{PKG}/operators/relational.py (union_all)"),
    "O6": ("Min-by-custom-rank top-1", f"{PKG}/functions/scalar.py (feature_code_postprocessing)"),
    # §2.7 scalar functions
    "F1": ("date_postprocessing", f"{PKG}/functions/scalar.py"),
    "F2": ("cocatenated_dates_postprocessing", f"{PKG}/functions/scalar.py"),
    "F3": ("label_creator_person", f"{PKG}/functions/scalar.py"),
    "F4": ("label_creator_place", f"{PKG}/functions/scalar.py"),
    "F5": ("label_creator_organization", f"{PKG}/functions/scalar.py"),
    "F6": ("geopoint_creator (WKT parse, lat/lng swap)", f"{PKG}/functions/scalar.py"),
    "F7": ("feature_code_postprocessing", f"{PKG}/functions/scalar.py"),
    "F8": ("GeoNames label", f"{PKG}/functions/scalar.py (geonames_label)"),
    "F9": ("GeoNames id URI", f"{PKG}/functions/scalar.py (geonames_id_uri)"),
    "F10": ("Wikidata id rebuild", f"{PKG}/functions/scalar.py (wikidata_id_rebuild)"),
    "F11": ("Time-span expansion", f"{PKG}/functions/scalar.py (time_span_bounds/label)"),
    "F12": ("WKT point literal build", f"{PKG}/functions/scalar.py (wkt_point_literal)"),
    "F13": ("lang()/langmatches filter", f"{PKG}/operators/relational.py (triple_pattern lang=)"),
    "F14": ("COALESCE", f"{PKG}/operators/relational.py (label_service_join) + resolve.py"),
    "F15": ("STRUUID / URI mint", f"{PKG}/resolve.py (deterministic sha256 strengthening)"),
    "F16": ("dateTime range predicates", "plans/q_flagship.py (pricing_summary filter)"),
    "F17": ("Incremental date predicate", f"{PKG}/streaming/incremental.py"),
    "F18": ("timedelta formatting", "driver-side metric (bench.py timings); not an engine op"),
    "F19": ("gender capitalize", f"{PKG}/functions/scalar.py (gender_capitalize)"),
    "F20": ("name appellation format", f"{PKG}/functions/scalar.py (name_appellation)"),
    "F21": ("swagger/json path probing", "plans/q_functions.py (json_probe; get_json_object)"),
    # §2.8 rendering
    "R1": ("render_person", f"{PKG}/render/person.py"),
    "R2": ("render_personplace_relation", f"{PKG}/render/entities.py (render_personplace_relations)"),
    "R3": ("render_personperson_relation", f"{PKG}/render/entities.py (render_personperson_relations)"),
    "R4": ("render_personrole_from_relation", f"{PKG}/render/entities.py (render_personroles)"),
    "R5": ("render_personrole", f"{PKG}/render/entities.py (render_personroles)"),
    "R6": ("render_personinstitution_relation", f"{PKG}/render/entities.py (render_personinstitution_relations)"),
    "R7": ("render_organizationplace_relation", f"{PKG}/render/entities.py (render_organizationplace_relations)"),
    "R8": ("render_organization", f"{PKG}/render/entities.py (render_organization)"),
    "R9": ("render_event", f"{PKG}/render/entities.py (_event_templates)"),
    "R10": ("render_place", f"{PKG}/render/entities.py (render_place)"),
    "R11": ("Namespace prefixes / base graph", f"{PKG}/render/namespaces.py"),
    "R12": ("Inverse-property materialization", f"{PKG}/render/person.py (materialize_inverses)"),
    "R13": ("CONSTRUCT provided entities", f"{PKG}/resolve.py (provided_entity_triples)"),
    # §2.9 sinks
    "K1": ("Get-or-create collection", f"{PKG}/sinks.py (UpsertClient.ensure_collection)"),
    "K2": ("Bulk upsert", f"{PKG}/sinks.py (upsert_foreach_partition)"),
    "K3": ("JSON file sink", f"{PKG}/sinks.py (write_json_docs)"),
    "K4": ("RDF serialize (nt/nq/ttl + typed literals)", f"{PKG}/sources/rdf.py (write_ntriples, write_turtle)"),
    "K5": ("Git branch/commit/push", f"{PKG}/sinks.py (publication_hook; driver-side)"),
    "K6": ("PR/MR creation", f"{PKG}/sinks.py (publication_hook; driver-side)"),
    "K7": ("Markdown run report", "bench.py JSON line (driver-side metrics)"),
    "K8": ("Slack notification", f"{PKG}/sinks.py (publication_hook; driver-side)"),
    # §2.10 incremental/streaming
    "T1": ("Incremental window", f"{PKG}/streaming/incremental.py (incremental_window)"),
    "T2": ("Idempotent upsert / late data", f"{PKG}/streaming/incremental.py (upsert_dedup)"),
    "T3": ("Stop condition (empty page)", f"{PKG}/sources/http.py (None body drops page)"),
    "T4": ("Rate limiting / retries", f"{PKG}/sources/http.py (TokenBucket, bounded retries)"),
}

EXTENSIONS: dict[str, tuple[str, str]] = {
    "X-DEDUP-EXACT": ("Exact dedup (hash-groupBy)", f"{PKG}/operators/dedup.py (exact_dedup)"),
    "X-DEDUP-NGRAM": ("N-gram Jaccard near-dup", f"{PKG}/operators/dedup.py (ngram_jaccard_pairs)"),
    "X-DEDUP-MINHASH": ("MinHash + LSH near-dup", f"{PKG}/operators/dedup.py (minhash_lsh_pairs)"),
    "X-DEDUP-SIMHASH": ("SimHash signatures", f"{PKG}/operators/dedup.py (simhash_signatures)"),
    "X-DEDUP-COSINE": ("Embedding-cosine near-dup", f"{PKG}/operators/dedup.py (embedding_cosine_pairs)"),
    "X-ANN-BRUTE": ("Brute-force cosine top-k", f"{PKG}/operators/similarity.py (cosine_topk)"),
    "X-ANN-LSH": ("Random-hyperplane LSH top-k", f"{PKG}/operators/similarity.py (rhp_lsh_topk)"),
    "X-ANN-IVF": ("IVF multi-probe top-k", f"{PKG}/operators/similarity.py (ivf_topk)"),
    "X-ANN-KMEANS": ("Spherical k-means IVF trainer (Lloyd's)", f"{PKG}/operators/similarity.py (kmeans_centroids)"),
    "X-TEXT-LANG": ("Language ID", f"{PKG}/operators/textstats.py (lang_id)"),
    "X-TEXT-QUALITY": ("Quality scoring", f"{PKG}/operators/textstats.py (quality_stats/score)"),
    "X-TEXT-TOKENS": ("Token counting", f"{PKG}/operators/textstats.py (token_count)"),
    "X-TEXT-FP": ("Document fingerprinting", f"{PKG}/operators/textstats.py (fingerprint)"),
    "X-MM-BINARY": ("Multimodal binary columns", f"{PKG}/operators/multimodal.py (attach_binary_payload)"),
    "X-MM-FEATURES": ("Arrow-batched feature extraction", f"{PKG}/operators/multimodal.py (extract_binary_features)"),
    "X-MM-FRAMES": ("Frame sampling (mapInPandas byte frames)", f"{PKG}/operators/multimodal.py (sample_frames)"),
    "X-MM-RESIZE": ("Resize / average-pool (mapInPandas)", f"{PKG}/operators/multimodal.py (resize_bytes)"),
    "X-MM-DECODE": ("Image decode (REAL: PPM/BMP/PNG, pure stdlib)", f"{PKG}/operators/multimodal.py (decode_image, decode_image_bytes)"),
    "X-WIN-TUMBLE": ("Tumbling windows", f"{PKG}/streaming/windows.py (tumble)"),
    "X-WIN-SLIDE": ("Sliding windows", f"{PKG}/streaming/windows.py (sliding_windows)"),
    "X-WIN-SESSION": ("Session windows", f"{PKG}/streaming/windows.py (sessionize)"),
    "X-STREAM": ("Structured Streaming (readStream/watermark/availableNow)", "plans/q_stream.py + tests/test_streaming.py (watermark/session/foreachBatch)"),
    "X-STATEFUL": ("Custom stateful operator (applyInPandasWithState)", f"{PKG}/streaming/stateful.py (last_write_wins_state)"),
    "X-ASOF": ("As-of join (latest right row at-or-before)", f"{PKG}/operators/temporal.py (as_of_join)"),
    "X-RANGE": ("Range join (point-in-interval, bucketized)", f"{PKG}/operators/temporal.py (range_join)"),
    "X-DEDUP-CLUSTERS": ("End-to-end keeper assignment (pairs -> components -> keeper)", "plans/q_dedup.py (q_dedup_clusters)"),
    "X-SAMPLE-HASH": ("Deterministic Bernoulli sampling (portable hash)", f"{PKG}/operators/sampling.py (hash_sample)"),
    "X-SAMPLE-STRAT": ("Stratified sampling (per-stratum fractions)", f"{PKG}/operators/sampling.py (stratified_sample)"),
    "X-SPLIT": ("Key-pure train/val/test split", f"{PKG}/operators/sampling.py (train_val_test)"),
    "X-PACK": ("Sharded concat-then-chunk sequence packing", f"{PKG}/operators/sampling.py (pack_greedy)"),
    "X-CURATE": ("End-to-end corpus curation (dedup keep + quality gate)", "plans/q_curation.py (q_corpus_curation)"),
    "X-DECONTAM": ("Benchmark decontamination (broadcast n-gram overlap)", f"{PKG}/operators/dedup.py (ngram_contamination)"),
    "X-REPETITION": ("Intra-doc repetition signal (Gopher-style filter)", f"{PKG}/operators/dedup.py (repetition_stats)"),
    "X-QUANTIZE": ("Int8 embedding quantization (symmetric per-vector)", f"{PKG}/operators/similarity.py (quantize_int8)"),
    "X-SALTED-AGG": ("Two-phase salted aggregation (hot-key skew guard)", f"{PKG}/operators/aggregates.py (salted_aggregate)"),
    "X-FOREACH-BATCH": ("Streaming foreachBatch -> upsert sink loop", "plans/q_stream.py (q_stream_foreach_batch_upsert)"),
    "X-MATVIEW": ("Incrementally-maintained materialized aggregate", f"{PKG}/streaming/incremental.py (refresh_materialized_agg)"),
    "X-FEDERATE": ("REST-source x parquet federation in one plan", "plans/q_sources.py (q_federated_rest_join)"),
    "X-TEXT-NORM": ("Text normalization + stopword removal (C4-style)", f"{PKG}/operators/textstats.py (normalize_text, remove_stopwords)"),
    "X-TFIDF": ("tf-idf term weighting (broadcast df table)", f"{PKG}/operators/ranking.py (tfidf)"),
    "X-BM25": ("Okapi BM25 scoring (scaled-integer sums)", f"{PKG}/operators/ranking.py (bm25)"),
    "X-PAGERANK": ("PageRank (integer-scaled, bit-exact iterations)", f"{PKG}/operators/ranking.py (pagerank)"),
    "X-PII": ("PII detection + redaction (regexp, RE2/Java-portable)", f"{PKG}/operators/textstats.py (pii_counts, redact_pii)"),
    "X-NGRAM-STATS": ("Corpus n-gram statistics (distributed top-k)", f"{PKG}/operators/textstats.py (ngrams)"),
    "X-SEMDEDUP": ("SemDeDup (k-means cluster + within-cell cosine prune)", f"{PKG}/operators/dedup.py (semdedup)"),
    "X-STREAM-DEDUP": ("Streaming deduplication (dropDuplicates + watermark)", "plans/q_stream.py (q_stream_dedup_keys)"),
    "X-DEDUP-INCR": ("Incremental near-dup admission vs signature store", "plans/q_dedup.py (q_dedup_incremental)"),
    "X-QUANTILES": ("Exact nearest-rank + t-digest quantiles", f"{PKG}/operators/aggregates.py (exact_quantiles, approx_quantiles)"),
    "X-FUNNEL": ("Ordered conversion funnel (keyed min + equi-joins)", "plans/q_temporal.py (q_funnel_conversion)"),
    "X-SCD2": ("Type-2 SCD dimension build (keyed lead window)", "plans/q_temporal.py (q_scd2_user_state)"),
    "X-COHORT": ("Cohort retention (epoch-week integer buckets)", "plans/q_temporal.py (q_cohort_retention)"),
    "X-HISTOGRAM": ("Fixed-width value histogram (exact scaled mass)", "plans/q_temporal.py (q_value_histogram)"),
    "X-BFS": ("BFS hop levels / unweighted shortest paths", f"{PKG}/operators/graph.py (bfs_levels)"),
    "X-PROFILE": ("Table profiling (nulls/cardinality/ranges, one pass)", f"{PKG}/operators/aggregates.py (profile_table)"),
    "X-TRENDING": ("Per-window trending top-k (keyed rank)", "plans/q_temporal.py (q_trending_topk)"),
    "X-ROLLUP": ("ROLLUP grouping sets in one pass", "plans/q_aggregates.py (q_rollup_pricing)"),
    "X-PIVOT": ("Long-to-wide pivot (pinned values, one agg)", "plans/q_aggregates.py (q_pivot_event_counts)"),
    "X-RUNNING": ("Running cumulative sums (exact scaled ints)", "plans/q_temporal.py (q_running_totals)"),
    "X-JSON": ("JSON path extraction from payload columns", "plans/q_temporal.py (q_json_extract_props)"),
    "X-URL": ("URL canonicalization + per-domain rollup", f"{PKG}/operators/web.py (canonicalize_url, registered_domain)"),
    "X-LM-SCORE": ("Unigram-LM quality scoring (exact perplexity proxy)", f"{PKG}/operators/lm.py (corpus_freq_score)"),
    "X-VOCAB": ("Vocabulary coverage curve (tokenizer sizing)", f"{PKG}/operators/lm.py (vocab_coverage)"),
    "X-QCLASS": ("Integer-weighted linear quality classifier", f"{PKG}/operators/lm.py (linear_quality_score)"),
    "X-MIXTURE": ("Domain-mixture sampling under a global budget", "plans/q_pipeline2.py (q_mixture_sample)"),
    "X-SEQ-PAIRS": ("(context, next-token) sequence pair mining", f"{PKG}/operators/temporal.py (context_target_pairs)"),
    "X-TRIANGLES": ("Degree-ordered triangle counting", f"{PKG}/operators/graph.py (triangle_count)"),
    "X-DIFF": ("Keyed snapshot diff (added/removed/changed by fingerprint)", f"{PKG}/operators/audit.py (snapshot_diff)"),
    "X-AUDIT": ("Order-independent per-group content checksum", f"{PKG}/operators/audit.py (content_checksum)"),
    "X-CDC-APPLY": ("CDC changelog apply (last-write-wins U/D merge)", f"{PKG}/operators/audit.py (cdc_apply)"),
    "X-ZORDER": ("Z-order clustering keys + per-file min/max stats", f"{PKG}/operators/layout.py (zorder_key, zorder_layout_stats)"),
    "X-HLL": ("Portable HyperLogLog distinct (engine-exact registers)", f"{PKG}/operators/sketch.py (hll_distinct)"),
    "X-BLOOM": ("Bloom-filter join pruning (exact via trailing semi-join)", f"{PKG}/operators/sketch.py (bloom_semi_join)"),
    "X-SSSP": ("Weighted shortest paths (delta-converging Bellman-Ford)", f"{PKG}/operators/graph.py (sssp_weighted)"),
    "X-CHUNK": ("Overlapping token-window chunking (RAG/context prep)", f"{PKG}/operators/textstats.py (chunk_tokens)"),
    "X-QNORM": ("Per-group percentile-rank normalization", "plans/q_pipeline4.py (q_quantile_transform)"),
    "X-HLL-MERGE": ("Mergeable HLL partials (union+MAX lattice)", f"{PKG}/operators/sketch.py (hll_registers, hll_merge_registers)"),
    "X-ANN-PQ": ("Product-quantization codes (per-subspace codebooks)", f"{PKG}/operators/similarity.py (pq_encode)"),
    "X-STREAM-HLL": ("Streaming windowed HLL (bounded-state cardinality)", "plans/q_pipeline5.py (q_stream_hll_distinct)"),
    "X-NEG-SAMPLE": ("Deterministic contrastive negative sampling", "plans/q_pipeline5.py (q_negative_sampling)"),
    "X-DEDUP-BEST": ("Quality-aware dedup keeper (argmax per cluster)", "plans/q_pipeline5.py (q_dedup_keep_best)"),
    "X-PROP-PATHS": ("SPARQL property-path compositions (seq/alt/inverse)", "plans/q_pipeline5.py (q_property_paths)"),
    "X-LINKAGE": ("Blocked record-linkage scoring (integer field weights)", "plans/q_pipeline6.py (q_record_linkage)"),
    "X-COMPACT": ("Small-file compaction planning (windowed bin-pack)", "plans/q_pipeline6.py (q_compaction_plan)"),
    "X-WINSOR": ("Winsorization at exact per-group quantiles", "plans/q_pipeline6.py (q_winsorize_values)"),
    "X-BPE": ("BPE trainer (distributed vocab agg + driver merges) + segmenter", f"{PKG}/operators/lm.py (bpe_train, bpe_segment)"),
    "X-CMS": ("Count-Min sketch heavy hitters (portable counters)", f"{PKG}/operators/sketch.py (cms_build, cms_estimate)"),
    "X-MAD": ("MAD robust outlier detection (exact nearest-rank)", "plans/q_pipeline7.py (q_mad_outliers)"),
    "X-EMB-OUTLIER": ("Per-label centroid outliers (mislabel candidates)", "plans/q_pipeline7.py (q_embedding_outliers)"),
    "X-MM-AUDIO": ("RIFF/PCM WAV decode + integer signal stats", f"{PKG}/operators/multimodal.py (decode_wav, synth_wav_bytes)"),
    "X-KCORE": ("Bounded k-core peeling (SQL-replayable rounds)", f"{PKG}/operators/graph.py (kcore_peel)"),
    "X-PMI": ("PMI collocation mining (integer ratio ranking)", "plans/q_pipeline8.py (q_pmi_collocations)"),
    "X-CLUSTER-COEF": ("Local clustering coefficients (degree-ordered corners)", f"{PKG}/operators/graph.py (triangle_corners)"),
    "X-STREAM-SESSION": ("Streaming gap sessionization (F.session_window)", "plans/q_pipeline9.py (q_stream_session_window)"),
    "X-BACKFILL": ("Missing-partition backfill planning", "plans/q_pipeline9.py (q_backfill_plan)"),
    "X-CONTRACT": ("Declarative data-contract validation report", "plans/q_pipeline9.py (q_data_contract_check)"),
    "X-KANON": ("k-anonymity audit over quasi-identifier tuples", "plans/q_pipeline10.py (q_k_anonymity_audit)"),
    "X-QGRAM-JOIN": ("Edit-distance<=1 fuzzy join (deletion neighborhoods)", "plans/q_pipeline10.py (q_fuzzy_join_ed1)"),
    "X-SWEEP": ("Sweep-line concurrency profile (peak sessions/hour)", "plans/q_pipeline10.py (q_concurrency_profile)"),
    "X-MANIFEST": ("Atomic manifest snapshots + time travel", f"{PKG}/sinks.py (manifest_commit, read_snapshot)"),
}

EXT_QUERIES = {
    "X-DEDUP-EXACT": ["dedup_exact"],
    "X-DEDUP-NGRAM": ["dedup_ngram_jaccard"],
    "X-DEDUP-MINHASH": ["dedup_minhash_lsh"],
    "X-DEDUP-SIMHASH": ["dedup_simhash"],
    "X-DEDUP-COSINE": ["dedup_embedding_cosine"],
    "X-ANN-BRUTE": ["ann_cosine_topk"],
    "X-ANN-LSH": ["ann_rhp_lsh_topk"],
    "X-ANN-IVF": ["ann_ivf_topk"],
    "X-ANN-KMEANS": ["ann_kmeans_cells"],
    "X-TEXT-LANG": ["text_lang_id"],
    "X-TEXT-QUALITY": ["text_quality"],
    "X-TEXT-TOKENS": ["text_fingerprint"],
    "X-TEXT-FP": ["text_fingerprint"],
    "X-MM-BINARY": ["multimodal_features"],
    "X-MM-FEATURES": ["multimodal_features"],
    "X-MM-FRAMES": ["multimodal_frame_sample"],
    "X-MM-RESIZE": ["multimodal_resize"],
    "X-MM-DECODE": ["multimodal_decode"],
    "X-WIN-TUMBLE": ["tumbling_window"],
    "X-WIN-SLIDE": ["sliding_window"],
    "X-WIN-SESSION": ["session_window"],
    "X-STREAM": ["stream_tumbling_window", "stream_sliding_window", "stream_stream_join"],
    "X-STATEFUL": ["stream_stateful_upsert"],
    "X-ASOF": ["asof_join"],
    "X-RANGE": ["range_join"],
    "X-DEDUP-CLUSTERS": ["dedup_clusters"],
    "X-SAMPLE-HASH": ["sample_hash_deterministic"],
    "X-SAMPLE-STRAT": ["sample_stratified"],
    "X-SPLIT": ["train_val_test_split"],
    "X-PACK": ["pack_sequences"],
    "X-CURATE": ["corpus_curation"],
    "X-DECONTAM": ["decontaminate_ngrams"],
    "X-REPETITION": ["doc_repetition"],
    "X-QUANTIZE": ["embedding_quantize_int8"],
    "X-SALTED-AGG": ["salted_aggregate_skew"],
    "X-FOREACH-BATCH": ["stream_foreach_batch_upsert"],
    "X-MATVIEW": ["incremental_matview"],
    "X-FEDERATE": ["federated_rest_join"],
    "X-TEXT-NORM": ["text_normalize"],
    "X-TFIDF": ["tfidf_terms"],
    "X-BM25": ["bm25_rank"],
    "X-PAGERANK": ["pagerank_nations"],
    "X-PII": ["pii_scrub"],
    "X-NGRAM-STATS": ["ngram_stats"],
    "X-SEMDEDUP": ["semdedup_keep"],
    "X-STREAM-DEDUP": ["stream_dedup_keys"],
    "X-DEDUP-INCR": ["dedup_incremental"],
    "X-QUANTILES": ["value_quantiles"],
    "X-FUNNEL": ["funnel_conversion"],
    "X-SCD2": ["scd2_user_state"],
    "X-COHORT": ["cohort_retention"],
    "X-HISTOGRAM": ["value_histogram"],
    "X-BFS": ["shortest_hops"],
    "X-PROFILE": ["table_profile"],
    "X-TRENDING": ["trending_topk"],
    "X-ROLLUP": ["rollup_pricing"],
    "X-PIVOT": ["pivot_event_counts"],
    "X-RUNNING": ["running_totals"],
    "X-JSON": ["json_extract_props"],
    "X-URL": ["url_canonicalize", "url_domain_stats"],
    "X-LM-SCORE": ["unigram_lm_score"],
    "X-VOCAB": ["vocab_coverage"],
    "X-QCLASS": ["quality_classifier"],
    "X-MIXTURE": ["mixture_sample"],
    "X-SEQ-PAIRS": ["sequence_context_pairs"],
    "X-TRIANGLES": ["triangle_count"],
    "X-DIFF": ["snapshot_diff"],
    "X-AUDIT": ["content_checksum"],
    "X-CDC-APPLY": ["cdc_apply"],
    "X-ZORDER": ["zorder_layout"],
    "X-HLL": ["hll_distinct"],
    "X-BLOOM": ["bloom_semi_join"],
    "X-SSSP": ["sssp_weighted"],
    "X-CHUNK": ["doc_chunking"],
    "X-QNORM": ["quantile_transform"],
    "X-HLL-MERGE": ["hll_merge"],
    "X-ANN-PQ": ["pq_codes"],
    "X-STREAM-HLL": ["stream_hll_distinct"],
    "X-NEG-SAMPLE": ["negative_sampling"],
    "X-DEDUP-BEST": ["dedup_keep_best"],
    "X-PROP-PATHS": ["property_paths"],
    "X-LINKAGE": ["record_linkage"],
    "X-COMPACT": ["compaction_plan"],
    "X-WINSOR": ["winsorize_values"],
    "X-BPE": ["bpe_vocab", "bpe_segment"],
    "X-CMS": ["cms_heavy_hitters"],
    "X-MAD": ["mad_outliers"],
    "X-EMB-OUTLIER": ["embedding_outliers"],
    "X-MM-AUDIO": ["audio_pcm_stats"],
    "X-KCORE": ["kcore_nodes"],
    "X-PMI": ["pmi_collocations"],
    "X-CLUSTER-COEF": ["clustering_coefficient"],
    "X-STREAM-SESSION": ["stream_session_window"],
    "X-BACKFILL": ["backfill_plan"],
    "X-CONTRACT": ["data_contract_check"],
    "X-KANON": ["k_anonymity_audit"],
    "X-QGRAM-JOIN": ["fuzzy_join_ed1"],
    "X-SWEEP": ["concurrency_profile"],
    "X-MANIFEST": ["manifest_snapshot_roundtrip"],
}


def main() -> None:
    queries, oracles = catalog.load()
    by_op: dict[str, list[str]] = {}
    for qname, ids in catalog.COVERAGE.items():
        for op in ids:
            by_op.setdefault(op, []).append(qname)

    lines = [
        "# COVERAGE — SURVEY §2 operator inventory -> implementation & checks",
        "",
        "Generated by `python scripts/gen_coverage.py`. 'Oracle' = the query is",
        "value-hash-checked against its DuckDB twin by the driver "
        "(`__spark_entry__.py`); 'rows-only' = no SQL-expressible twin;",
        "'module' = exercised via unit tests rather than a catalog query.",
        "",
        "## Reference operators (SURVEY §2)",
        "",
        "| id | operator | implementation | catalog queries | check |",
        "|---|---|---|---|---|",
    ]
    for op, (desc, impl) in INVENTORY.items():
        qs = sorted(set(by_op.get(op, [])))
        if qs:
            check = "oracle" if all(q in oracles for q in qs) else "mixed"
        else:
            check = "module tests"
        lines.append(f"| {op} | {desc} | `{impl}` | {', '.join(qs) or '—'} | {check} |")

    lines += [
        "",
        "## Scale extensions (BASELINE.json north star)",
        "",
        "| id | capability | implementation | catalog queries | check |",
        "|---|---|---|---|---|",
    ]
    for op, (desc, impl) in EXTENSIONS.items():
        qs = EXT_QUERIES.get(op, [])
        if qs:
            check = "oracle" if all(q in oracles for q in qs) else "mixed"
        else:
            check = "module tests"
        lines.append(f"| {op} | {desc} | `{impl}` | {', '.join(qs) or '—'} | {check} |")

    lines += [
        "",
        "## Query -> operator ids",
        "",
        "| query | covers | oracle |",
        "|---|---|---|",
    ]
    for qname in sorted(queries):
        ids = ", ".join(catalog.COVERAGE.get(qname, [])) or "extension"
        lines.append(f"| {qname} | {ids} | {'yes' if qname in oracles else 'rows-only'} |")

    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"), "w") as f:
        f.write(out)
    print(f"COVERAGE.md: {len(INVENTORY)} reference ops, {len(EXTENSIONS)} extensions, {len(queries)} queries")


if __name__ == "__main__":
    main()
