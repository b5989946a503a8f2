"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

CLI (round-8, VERDICT r7 item 4):

    python bench.py                        # full sweep (the driver's call):
                                           # builds + canary + every headline
                                           # row, writes BENCH_DETAIL.json
    python bench.py name1 name2 --min-of 3 # selective re-check: times ONLY
                                           # the named rows (min-of-N),
                                           # stdout/stderr only — BENCH_DETAIL
                                           # is never touched
    python bench.py --skip-builds nameN    # selective, skipping the warm-up
                                           # builds (rows that don't read the
                                           # per-process model caches)

Unknown names fail fast listing near-misses, so a typo'd re-check can't
silently run the 5-minute sweep (the old behavior for ANY argv).
"""

from __future__ import annotations

import argparse
import difflib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_spark.queries import all_queries  # noqa: E402

QUERIES = all_queries()
from vector_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: grows as phases land
HEADLINE = [
    "knn_exact_batch",
    "knn_exact_sql",
    "knn_cosine",
    "knn_filtered",
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "user_sessions",
    "ivf_search_det",
    "ivf_search_kmeans",
    "pq_adc_kmeans",
    "ivfpq_search_kmeans",
    "near_dup_jaccard",
    "ann_lsh_search",
    "stream_hourly_counts",
    "stream_ingest_cluster_counts",
    # round-3 surface: curation / hybrid / incremental dedup
    "doc_repetition",
    "boilerplate_frac",
    "decontaminate_ngrams",
    # round-9: per-suite attribution forms (one corpus pass, N suites)
    "decontaminate_ngrams_multi",
    "embedding_decontaminate_multi",
    "embedding_decontaminate",
    "hybrid_search",
    "incremental_dedup",
    # round-8: the persisted-signature-index probe (build amortized like
    # the other *_build caches; the row times the steady-state probe)
    "incremental_dedup_indexed",
    # round-9: the end-to-end maintenance composition; the cycle itself
    # is one-shot (corpus_maintenance_cycle in the builds section), the
    # row re-reads the measured facts
    "corpus_maintenance_audit",
    # round-3 additions: RAG chunking, binary quantization, MMR rerank
    "chunk_manifest",
    "chunk_semantic_search",
    "bq_hamming_search",
    "mmr_diversified",
    "stream_query_serving",
    # round-3 additions: LM scoring, export, PCA, BPE, classifier, graphs
    "bigram_lm_score",
    "export_shard_manifest",
    "heavy_hitter_tokens",
    "pca_audit",
    "doc_classifier_audit",
    "bpe_merges",
    "fuzzy_typo_pairs",
    "late_interaction_search",
    "embedding_standardize",
    "stream_value_anomalies",
    "length_bucketed_batches",
    "ivf_recall_sweep",
    "bq_retrieval_metrics",
    "scd2_customer_history",
    "funnel_conversion",
    "cohort_retention",
    "part_cooccurrence_triangles",
    "incremental_hourly_counts",
    "weighted_sample_quality",
    "percolate_alerts",
    # round-8: the subscription-scaled percolation form (wave-14b's true
    # matching-volume curve, registered)
    "percolate_scaled_subscriptions",
    "table_expectations",
    "cluster_topic_terms",
    "part_link_prediction",
    "doc_keywords",
    "snapshot_diff_customers",
    "value_histogram",
    "frequent_event_paths",
    "embedding_isotropy",
    "winsorized_value_stats",
    # round-4 additions: sketches, profiling, adaptive cuts, OPQ
    "hll_rollup_users",
    "digest_price_quantiles",
    "event_key_skew",
    "adaptive_quality_cut",
    "matryoshka_overlap",
    "opq_adc_recall",
    "stream_hll_rollup",
    "join_size_preflight",
    "group_sample_per_lang",
    "corpus_drift_js",
    "interleave_training_order",
    "corpus_governance_report",
    "hnsw_export_stats",
    # round-7: the scale-safe derived-k export + the native first-seen
    # path that retires the Python-state floor
    "hnsw_export_derived_k",
    "stream_first_seen_native",
    "recall_bytes_frontier",
    "ivf_search_cosine_det",
    "asof_next_order",
    "asof_nearest_order",
    # round-3 (this session): time-series rollups + KMV theta sketches
    "ohlc_daily_bars",
    "resample_ffill_purchases",
    "ewma_purchase_values",
    "value_mad_outliers",
    "kmv_orderkey_overlap",
    "cms_token_freq",
    "jl_projection_audit",
    "twa_purchase_values",
    "counter_rate_purchases",
    "stream_ohlc_daily",
    "simhash_near_dup",
    "rolling_7d_purchase_stats",
    "seasonal_hourly_outliers",
    "stream_segment_enrichment",
    "quality_calibration_audit",
    "graph_random_walks",
    "graph_skipgram_pairs",
    "value_quantile_bins",
    "stream_hourly_top_types",
    "graph_negative_samples",
    "value_percentile_ranks",
    "cms_join_size",
    "node2vec_biased_walks",
    # round-4 additions: driver-visible lifecycle audits + co-purchase PPR
    "versioned_lifecycle_audit",
    "node_table_crud_audit",
    "copurchase_ppr_expansion",
    "purchase_window_events",
    # round-6: interval range join took a driver slot — bench its row too
    "range_join_user_activity",
    "versioned_layout_audit",
    "inverted_bm25_search",
    "leakage_safe_split",
    "bpe_tokenize_audit",
    "right_to_erasure_audit",
    "prefix_filter_jaccard",
    "doc_novelty",
    "association_rules",
    "image_phash_near_dup",
    # round-6 additions: decayed hot-keys, record linkage
    "decayed_event_type_scores",
    "record_linkage_customers",
    # round-4 closing additions
    "containment_near_dup",
    "ann_lsh_multiprobe",
    # round-6: wave-10/11 mitigation — capped co-occurrence triangles +
    # the knob-from-budget wedge audit that prices the join before running
    "cooccurrence_capped_triangles",
    "cooccurrence_budget_audit",
    # r5: the benched family row is the df-cut production form — the
    # full-volume tfidf_cosine_pairs stays the correctness baseline in
    # the oracle suite, but its sf0.1 wall time has a documented 5.6-12 s
    # tenancy band (flat synthetic df defeats the 0.2 cut), too wide for
    # the 2x regression gate to mean anything. r6: the cut is now
    # BUDGET-DERIVED (ceiling from the df histogram under Σdf² ≤ 500k —
    # SCALE.md wave-4), slightly harsher than the old 0.05 frac at sf0.1.
    "tfidf_cosine_pairs_cut",
    "stream_unattributed_clicks",
    "part_link_prediction_aa",
    "click_purchase_crosscorr",
    "kmv_orderkey_difference",
    "quality_dup_auc",
    "token_collocations_pmi",
    "quality_weighted_draw",
    "udaf_event_median",
    "udtf_token_positions",
    # round-8: the blocked decontamination scale twin took a driver slot —
    # bench its row alongside the exact (priced) form
    "embedding_decontaminate_blocked",
    # round-4: Python DataSource connectors + VARIANT metadata
    "pyds_jsonl_roundtrip",
    "pyds_stream_replay",
    "events_variant_stats",
    "stream_state_inspection",
    "ivf_incremental_update",
    "rendezvous_shard_stability",
    "copurchase_als_recs",
    "frequent_event_itemsets",
    "sequential_event_patterns",
    "cusum_level_shifts",
    "coverage_exemplar_docs",
    "coverage_exemplar_stochastic",  # r5: the n·ln(1/eps) production form
    "trend_mann_kendall",
    # dbscan_embedding_clusters is registry-tested but not benched: like
    # knn_pagerank, its wall time is hash-min component rounds (each a
    # tiny join + localCheckpoint + convergence count), i.e. scheduler
    # overhead at fixture scale, not scan volume; the oracle row keeps
    # the full construction correctness-checked every round
    # knn_pagerank is registry-tested but not benched: power iteration is
    # ~2 tiny jobs per round, so fixture-scale wall time is scheduler
    # overhead (~17 s), not data volume — not a steady-state query number.
    # copurchase_ktruss likewise: the iterative peel is 4-6 full triangle
    # passes whose fixture-scale time is round-trip scheduling, not scan
    # volume; its per-round shuffle budget is pinned structurally
    # (tests/test_knn_graph.py) and the oracle row keeps it correctness-
    # checked every round
]

# entries with a PERF.md-documented wide band get a third sample — their
# min-of-2 still spanned >1.5× across passes (see main() for the rationale)
MIN3 = {
    "tfidf_cosine_pairs_cut", "coverage_exemplar_docs",
    "coverage_exemplar_stochastic", "copurchase_ppr_expansion",
    "near_dup_jaccard", "incremental_dedup", "association_rules",
}


def _canary_sample() -> float:
    """One sample of the tenancy canary (VERDICT r7 item 5): a fixed,
    seeded, CPU-bound matmul of constant size (~17 GFLOP through the
    BLAS threadpool). Samples are taken at the sweep start AND
    interleaved every ``_CANARY_EVERY`` queries — a single start-of-run
    sample can miss a co-tenant arriving mid-sweep; the interleaved
    series measures the tenancy of THIS run's span. BENCH_DETAIL records
    the full series (``canary_samples``) plus the min
    (``canary_matmul_sec``, the top-level scalar the compact stdout line
    echoes — idle reference ~0.10 s, PERF.md round-8). Never in the
    query map or the headline total."""
    import numpy as np

    a = np.random.default_rng(8).standard_normal((1024, 1024))
    t0 = time.perf_counter()
    acc = a
    for _ in range(8):
        acc = a @ a
    float(acc[0, 0])  # consume
    return round(time.perf_counter() - t0, 3)


_CANARY_EVERY = 40


def _time_builds(spark, builds: dict[str, float]) -> None:
    """One-time index builds, timed as their own section so the regression
    gate tracks steady-state search (the *_kmeans query numbers run against
    the warm per-process caches these calls populate).

    HIGH-VARIANCE by construction (VERDICT r7 item 6): each build runs
    exactly ONCE per process — a second sample would hit the per-process
    model cache and time nothing — so these are single cold samples with
    no min-of protection, and PERF.md round-7 measured ivfpq_build swinging
    3.8→20.3 s under co-tenant load. They are therefore recorded in a
    separate ``builds`` section of BENCH_DETAIL, EXCLUDED from the headline
    total and from gate ratios; read them against the canary, not against
    each other across rounds."""
    from vector_db_spark.queries.curation import _inverted_index
    from vector_db_spark.queries.indexing import _als_model, _ivfpq_index, _kmeans_index
    from vector_db_spark.queries.pquant import _opq_model, _pq_model
    from vector_db_spark.queries.text import _maintenance_facts

    for name, build in (
        ("ivf_kmeans_build", _kmeans_index),
        ("ivfpq_build", _ivfpq_index),
        ("pq_train_build", _pq_model),
        ("opq_build", _opq_model),
        ("inverted_index_build", _inverted_index),
        ("als_build", _als_model),
        ("corpus_maintenance_cycle", _maintenance_facts),
    ):
        t0 = time.perf_counter()
        build(spark, SF_DIR)
        builds[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {builds[name]}s", file=sys.stderr)


def _parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        description="Headline-query benchmark. No names = the driver's "
        "full sweep (writes BENCH_DETAIL.json); names = selective "
        "re-check (stdout/stderr only)."
    )
    ap.add_argument("names", nargs="*", help="query names to time (subset run)")
    ap.add_argument(
        "--min-of", type=int, default=0, metavar="N",
        help="samples per query, min reported (default: per-query policy — "
        "2, or 3 for the documented wide-band rows)",
    )
    ap.add_argument(
        "--skip-builds", action="store_true",
        help="selective runs only: skip the index-build warm-up (rows that "
        "read the per-process model caches will pay the build in-row)",
    )
    args = ap.parse_args()
    if args.min_of < 0:
        ap.error("--min-of must be >= 0 (0/omitted = per-query policy)")
    known = set(HEADLINE) | set(QUERIES)
    unknown = [n for n in args.names if n not in known]
    if unknown:
        hints = {
            n: difflib.get_close_matches(n, sorted(known), n=3, cutoff=0.5)
            for n in unknown
        }
        ap.error(f"unknown query names: {hints}")
    if args.skip_builds and not args.names:
        ap.error("--skip-builds is for selective runs (the full sweep's "
                 "steady-state numbers depend on the build warm-up)")
    return args


def main() -> None:
    args = _parse_args()
    selective = bool(args.names)
    spark = get_spark("bench")
    # warm the JVM, parquet footer cache, AND the Python UDF workers once,
    # outside timing — first Arrow exchange pays worker fork + import cost
    from vector_db_spark.io import load_table, load_tables
    from vector_db_spark.operators.knn import knn_self

    for df in load_tables(spark, SF_DIR).values():
        df.count()
    knn_self(load_table(spark, SF_DIR, "embeddings"), 1, n_queries=1).count()

    canary_samples = [_canary_sample()]
    print(f"# canary_matmul[0]: {canary_samples[0]}s", file=sys.stderr)
    builds: dict[str, float] = {}
    if not (selective and args.skip_builds):
        _time_builds(spark, builds)

    # two timed runs per query, min reported: the machine shares CPU with
    # other tenants and a single sample regularly inflates 1.5-3×; min-of-2
    # is the steady-state number the regression gate should track.
    # Entries with a PERF.md-documented wide band get a third sample —
    # their min-of-2 still spanned >1.5× across passes (MIN3 above).
    # Consumer choice, deliberate: .count() — the SAME consumer the frozen
    # r01/r02 baseline rows were measured with, so the 2x regression gate
    # compares like with like. A bare count lets Catalyst prune unread
    # expression-only work (an unused Window/projection vanishes), so
    # window/projection-heavy rows under-measure in ABSOLUTE terms — the
    # scale-curve scripts, whose purpose is detecting super-linear WORK,
    # use the full-evaluation agg(count, sum(hash(*cols))) consumer
    # instead (scripts/scale_wave12.run, protocol note in SCALE.md
    # wave-14). Changing bench's consumer would invalidate every
    # cross-round band in PERF.md; don't, unless the baseline is re-run.
    run_list = args.names if selective else HEADLINE
    timings: dict[str, float] = {}
    n_timed = 0
    for name in run_list:
        if name not in QUERIES:
            continue
        samples = args.min_of or (3 if name in MIN3 else 2)
        best, n = float("inf"), 0
        for _ in range(samples):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        n_timed += 1
        if n_timed % _CANARY_EVERY == 0:
            canary_samples.append(_canary_sample())
            print(
                f"# canary_matmul[{len(canary_samples) - 1}]: "
                f"{canary_samples[-1]}s",
                file=sys.stderr,
            )
    canary_samples.append(_canary_sample())

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # The driver captures only a short tail of stdout, so the final line must
    # stay compact (<200 chars): headline scalar only. The full per-query map
    # goes to stderr and BENCH_DETAIL.json for humans and the judge — and,
    # since r10 (VERDICT r9 item 3), ALSO to stdout as a second single-line
    # JSON (`per_query_wall`) printed BEFORE the compact contract line, so a
    # driver that reads more than the tail can populate its per-query
    # comparison without touching the existing contract.
    detail = {
        "metric": "headline_queries_total_wall",
        # protocol 2 = the r8 redefinition: one-shot *_build rows live in
        # the separate "builds" section and are EXCLUDED from "value"
        # (pre-r8 rounds folded them in). The explicit version keeps
        # cross-round tooling from silently comparing the two
        # definitions under the unchanged metric name.
        "protocol": 2,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # r8 protocol (VERDICT r7 items 5+6): builds are single cold
        # samples (high variance, excluded from the total and from gate
        # ratios); the canary is the constant-work tenancy reference —
        # min as the scalar, the interleaved series for load-over-time
        "builds": builds,
        "canary_matmul_sec": min(canary_samples),
        "canary_samples": canary_samples,
        "sf": float(sf),
    }
    print(json.dumps(detail), file=sys.stderr)
    if not selective:
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
                ),
                "w",
            ) as f:
                json.dump(detail, f, indent=1)
        except OSError as e:
            print(f"# BENCH_DETAIL.json write failed: {e}", file=sys.stderr)
    # r10 (VERDICT r9 item 3): per-query timings as their own stdout line.
    # Additions-only — the compact contract line stays LAST so tail-capture
    # drivers keep parsing exactly what they parsed before.
    print(
        json.dumps(
            {
                "metric": "per_query_wall",
                "protocol": 2,
                "unit": "sec",
                "sf": detail["sf"],
                "canary": detail["canary_matmul_sec"],
                "queries": timings,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "protocol": 2,
                "value": detail["value"],
                "unit": "sec",
                "sf": detail["sf"],
                "n_queries": len(timings),
                "canary": detail["canary_matmul_sec"],
            }
        )
    )
    from vector_db_spark.caching import release_caches

    release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
