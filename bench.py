"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a cheap count() (no driver-side collect of
full results) after a warm-up of the session JVM via a trivial action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    # scan/agg/join analytics
    "q1_pricing_summary", "q3_top_unshipped", "q5_revenue_by_nation",
    "top_suppliers_per_nation", "sales_rollup", "customer_order_stats",
    "urgent_share_by_flag", "big_order_customers",
    # operator parity
    "dedup_keep_newest", "merge_upsert_orders", "explode_flatten_orders",
    "coercion_kernel_events", "sessionize_events", "user_running_totals",
    "revenue_by_year_region", "salted_event_type_totals",
    # TPC-H breadth (multi-join, window rewrite, two-level agg)
    "nation_trade_volume", "returned_revenue_customers",
    "customer_order_distribution", "exclusive_fault_suppliers",
    # retail basket analytics (bounded pair self-join) + profiling
    "copurchase_pairs", "basket_lift", "table_profile_orders",
    # LLM-pipeline extensions
    "text_stats", "doc_length_percentiles", "length_outlier_docs",
    "exact_dedup", "minhash_lsh_pairs", "simhash_docs",
    "duplicate_chunk_spans", "semantic_dedup_cells",
    "segment_dedup_docs", "chunk_documents", "quality_classifier_scores",
    "brute_force_topk", "lsh_bucketed_topk", "ivf_topk", "quantized_topk",
    "embedding_cluster_summary", "embedding_norm_stats",
    "user_value_median", "multimodal_features",
    # hygiene gates
    "benchmark_contamination", "gopher_quality_flags", "repetition_flags",
    "lm_rarity_docs",
    # corpus statistics + cross-modal fusion
    "tfidf_top_terms", "cross_source_overlap", "lexical_semantic_pairs",
    # corpus prep (cleaning / OOV gate / split / link stats)
    "unicode_clean_docs", "vocab_coverage_docs", "train_val_split",
    "domain_link_stats",
    # curation
    "stratified_lang_sample", "token_budget_sample", "source_mixture_sample",
    "sequence_packing", "cluster_size_histogram",
    # late r8: leakage-safe splitting tiers + shard assignment (the BPE
    # pair stays in the registry tail: its cold time is the one-off
    # artifact TRAIN, which would distort the comparable headline series)
    "leakage_safe_splits", "near_dup_safe_splits", "training_shards",
    # end-to-end curation chain (reuses the cluster artifact above)
    "curated_corpus_summary",
    # range join + semi-structured read-back
    "event_pairs_range_join", "props_json_totals",
    "customer_spend_deciles",
]


def _bench_set(spark, queries, sf_dir, names, timings, warm, errors,
               noise) -> None:
    # SPARK_GRAFT_BENCH_WARM_RUNS = N takes the MIN of N warm repeats —
    # one warm sample can land on a GC pause / ContextCleaner burst and
    # read 10-30x slow (observed at sf1). Default is 3 since r6: min-of-3
    # is the steady-state estimate, and the repeat SPREAD per query is
    # the in-session noise floor the round-over-round comparison needs
    # (VERDICT r5 "what's wrong" #3 — an 18% headline drift was
    # unadjudicable without it). The artifact records warm_runs so series
    # with different settings are never silently compared.
    warm_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "3")))
    # Per-query fault isolation: one broken query must never zero the whole
    # artifact — record its error, keep timing the rest, and always emit
    # the JSON line (exit code stays 0 so the driver records partial data).
    for name in names:
        try:
            fn = queries[name]
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
            # warm runs: plan + codegen cached -> steady-state execution
            # cost (cold time is dominated by one-time Catalyst/codegen
            # compile, which amortizes to zero at scale)
            samples = []
            for _ in range(warm_runs):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            warm[name] = round(min(samples), 3)
            if len(samples) > 1:
                noise[name] = round(
                    (max(samples) - min(samples)) / max(min(samples), 1e-9), 3
                )
            print(f"# {name}: cold {timings[name]:.3f}s / warm {warm[name]:.3f}s ({n} rows)",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    queries = entrymod.queries()

    # JVM/codegen warm-up on a small unrelated action
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Machine-speed calibration: a fixed CPU-bound job whose work never
    # changes across rounds, so every artifact carries its own
    # throughput normalizer. Round 8 measured ~40% ambient drift on the
    # SAME commit 4h apart (docs/SCALE.md "Bench drift control");
    # cross-round comparisons should divide by calib_sec ratios before
    # reading anything as a regression. min-of-3 like the query timings.
    def _calib_once() -> float:
        t0 = time.time()
        spark.range(2_000_000_000).selectExpr(
            "sum(id * 2654435761 % 1000000007)"
        ).collect()
        return time.time() - t0

    calib_sec = round(min(_calib_once() for _ in range(3)), 3)

    # Python-worker-pool warm-up (r13, guide §1: time the computation,
    # not infrastructure startup): Arrow kernels fork one Python worker
    # per core on first use, and WHICH timed entry absorbed that fork
    # cost depended on how much Arrow work the prebuilds below happened
    # to do — a populated on-disk index store serves them as parquet
    # reads and leaves the pool cold (duplicate_chunk_spans cold
    # measured 2.7-2.9 s with a warm store vs 1.1 s after
    # rebuild-heavy prebuilds, same commit). One trivial mapInPandas
    # over cpus partitions pays the fork HERE, timed and reported, so
    # the timed colds measure query work deterministically — the same
    # attribution rule as the JVM warm-up action above and the
    # artifact_prebuild map (cost visible, never hidden).
    t0 = time.time()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()
    python_worker_warmup = round(time.time() - t0, 3)

    # Pre-materialize the write-through index artifacts (VERDICT r9 #7):
    # a store version bump used to land its one-off cold rebuild inside
    # whichever registry entry touched the store first (r9 close bench:
    # semantic_dedup_cells 0.28->3.94 s, cluster_size_histogram
    # 0.45->3.95 s — all artifact build, not query work). Building them
    # HERE, each timed into artifact_prebuild, keeps the registry's
    # cold timings attributable to query work only; the artifact cost
    # stays visible in the output instead of polluting a query's number.
    artifact_prebuild: dict[str, float] = {}

    def _prebuild(name, fn):
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            artifact_prebuild[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — missing table etc.
            artifact_prebuild[name] = f"ERROR {type(exc).__name__}"[:80]

    from e_commerce_etl_pipeline_spark.extensions import (
        components as _cmp,
        contamination as _cont,
        dedup_fuzzy as _dfz,
        quality_model as _qm,
        semantic_dedup as _sem,
        similarity as _sim,
        tfidf as _tfidf,
    )
    from e_commerce_etl_pipeline_spark.plans import queries as _pq

    _prebuild("near_dup_p1", _sim.near_dup_p1_clusters)
    _prebuild("near_dup_clusters", _sim.near_dup_clusters)
    _prebuild("ivf_centroids", _sim.trained_centroids)
    _prebuild("ivf_assignment", _sim.ivf_assignment)
    _prebuild("dedup_clusters", _cmp.dedup_clusters)
    _prebuild("semantic_dedup_cells", _sem.semantic_dedup_cells)
    # r13 (VERDICT r12 #2): the remaining once-per-snapshot artifact
    # builds used to land inside whichever timed entry touched the store
    # first (r12 driver run: benchmark_contamination cold 5.31 s vs warm
    # 0.29 s, minhash_lsh_pairs 3.04/0.75, cross_source_overlap
    # 2.80/0.66, copurchase_pairs 2.85/0.61 — mostly shingle/gram/tfidf/
    # basket/model construction, not query work). Build them here, each
    # timed into artifact_prebuild, same as the near-dup/IVF artifacts
    # since r9: the cost stays visible in the output instead of
    # polluting a query's cold number.
    _prebuild("real_shingles", _dfz.real_shingles)
    _prebuild("mutated_shingles", _dfz.mutated_shingles)
    _prebuild("term_frequencies", _tfidf.term_frequencies)
    _prebuild("contamination_grams", _cont.contamination_grams)
    _prebuild("quality_weights", _qm.quality_classifier_weights)
    _prebuild("basket_items", _pq._basket_items)

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    noise: dict[str, float] = {}
    _bench_set(spark, queries, sf_dir, HEADLINE, timings, warm, errors, noise)

    # Long tail: every registry entry outside the headline set, so per-round
    # regression tracking covers the full surface (VERDICT r4 item 7). Tail
    # failures are recorded separately and do NOT invalidate the headline
    # metric — the headline series must stay comparable across rounds.
    # The drained-stream end-state entries run a full Structured
    # Streaming lifecycle per invocation (file source + checkpoint +
    # availableNow drain into a fresh temp work dir) — they measure
    # trigger/sink machinery, not a query plan, and they cost the same
    # 5-27 s on every "warm" repeat. Excluding them keeps the timed
    # registry at the SAME 120 entries as the r9 series (comparable
    # totals); their correctness is still graded by the driver's
    # oracle gate and the full sweep like every other entry.
    stream_drains = {
        "stream_span_dedup_state", "stream_quality_state",
        "stream_token_state", "stream_upsert_state",
        # r12: the tombstone lifecycle entry is the same category — a
        # full store seed/delete/compact per invocation into a fresh
        # temp work dir; its cost is the maintenance benches' subject
        # (BENCH_incremental_*), not a query plan
        "near_dup_tombstone_state",
    }
    tail_names = [
        n for n in queries
        if n not in set(HEADLINE) and n not in stream_drains
    ]
    tail_timings: dict[str, float] = {}
    tail_warm: dict[str, float] = {}
    tail_errors: dict[str, str] = {}
    tail_noise: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_TAIL", "1") != "0":
        _bench_set(spark, queries, sf_dir, tail_names, tail_timings,
                   tail_warm, tail_errors, tail_noise)

    # A partial headline run must not be comparable to a complete one: a
    # failed (especially heavy) query would otherwise LOWER the reported
    # total and grade as a speedup (ADVICE r4). valid=false + null totals.
    valid = not errors
    total = round(sum(timings.values()), 3) if valid else None
    total_warm = round(sum(warm.values()), 3) if valid else None

    # Suite noise floor: median over queries of per-query warm spread
    # (max-min)/min. Interpreting round-over-round drift: a headline
    # ratio within ~noise_pct of 1.0 is ambient variance, not a
    # regression (VERDICT r5 #3).
    all_noise = {**noise, **tail_noise}
    noise_pct = None
    if all_noise:
        vals = sorted(all_noise.values())
        noise_pct = round(100 * vals[len(vals) // 2], 1)

    # Silent-cap visibility: rows the basket fence truncated this run
    # (None when lineitem never exceeded MAX_BASKET_ITEMS per order —
    # the expected case on sane data).
    try:
        from e_commerce_etl_pipeline_spark.plans.queries import (
            basket_fence_dropped_rows,
        )
        basket_dropped = basket_fence_dropped_rows(sf_dir)
    except Exception:  # noqa: BLE001 — reporting must not fail the bench
        basket_dropped = None
    # Same rule for the near-dup LSH bucket fence (similarity.py): the
    # number of vectors the per-bucket candidate cap excluded this corpus.
    try:
        from e_commerce_etl_pipeline_spark.extensions.similarity import (
            lsh_fence_dropped,
        )
        lsh_dropped = lsh_fence_dropped(spark, sf_dir)
    except Exception:  # noqa: BLE001 — reporting must not fail the bench
        lsh_dropped = None
    # Recall next to the drop counts (r7): what the fence's drops COST
    # in recovered near-dup pairs, and what the chain-link cluster
    # hybrid recovers — the number a user needs before trusting either
    # path on a clone-heavy corpus.
    # Map-only supplement (r12, guide §1.4): for queries whose plan is a
    # pure cardinality-preserving projection over one scan, the timed
    # count() action PRUNES the computed columns entirely (the scan reads
    # zero columns — verified: simhash_docs counts in 0.26 s but computes
    # in 2.9 s under the noop sink). The count-based `queries`/`value`
    # series stays EXACTLY as in r2-r11 (same action, same comparability);
    # this block records the honest compute cost of those entries
    # separately via a noop write, as `map_only_noop_warm` (min of 2 warm
    # repeats). List derived by scanning every registry plan for
    # all-empty ReadSchema under count() at r12; regenerate the same way
    # if entries change shape.
    MAP_ONLY_PRUNED = [
        "text_stats", "lang_id_docs", "simhash_docs", "redact_pii_docs",
        "coercion_kernel_events", "load_statistics", "row_count_report",
        "schema_aligned_events", "asof_last_purchase",
        "user_running_totals", "training_shards", "funnel_conversion",
        "gopher_quality_flags", "repetition_flags", "unicode_clean_docs",
    ]
    map_only_noop_warm: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_NOOP", "1") != "0":
        for name in MAP_ONLY_PRUNED:
            fn = queries.get(name)
            if fn is None:
                continue
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples = []
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    samples.append(time.time() - t0)
                map_only_noop_warm[name] = round(min(samples), 3)
            except Exception:  # noqa: BLE001 — supplement must not fail bench
                pass

    near_dup_recall = None
    try:
        from e_commerce_etl_pipeline_spark.extensions.similarity import (
            near_dup_recall_eval,
        )
        near_dup_recall = {
            r["method"]: {
                "n_exact": r["n_exact"], "n_recovered": r["n_recovered"],
                "recall": r["recall"],
            }
            for r in near_dup_recall_eval(spark, sf_dir).collect()
        }
    except Exception:  # noqa: BLE001 — reporting must not fail the bench
        pass

    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "valid": valid,
        "warm_runs": max(1, int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "3"))),
        "noise_pct": noise_pct,
        "queries": timings,
        "queries_warm": warm,
        "queries_noise": noise,
        "total_warm": total_warm,
        "registry_tail": tail_timings,
        "registry_tail_warm": tail_warm,
        "registry_tail_noise": tail_noise,
        "registry_total_warm": (
            round(sum(warm.values()) + sum(tail_warm.values()), 3)
            if valid and not tail_errors else None
        ),
        "map_only_noop_warm": map_only_noop_warm,
        "basket_fence_dropped_rows": basket_dropped,
        "lsh_fence_dropped_vecs": lsh_dropped,
        "near_dup_recall": near_dup_recall,
        "calib_sec": calib_sec,
        "python_worker_warmup": python_worker_warmup,
        "artifact_prebuild": artifact_prebuild,
        "untimed_stream_drains": sorted(stream_drains),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    if tail_errors:
        out["tail_errors"] = tail_errors
    line = json.dumps(out)
    # The driver's artifact keeps only a 2000-char stdout tail (ADVICE
    # r5 #1), which truncates the 102-query JSON mid-object — persist the
    # complete artifact to a file the repo commits alongside each round.
    out_file = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    if out_file:
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   out_file), "w") as f:
                f.write(line + "\n")
        except OSError as exc:
            print(f"# could not write {out_file}: {exc}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
