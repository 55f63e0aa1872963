"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count),
best-of-N runs (N = $SPARK_GRAFT_BENCH_RUNS, default 3) so a transient
stall on a contended machine can't masquerade as a code regression
(round 2 lost 2.2x to exactly that). A warmup pass amortizes
JVM/session startup; the 1-minute load average is stamped into the
JSON so environmental noise is self-diagnosing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_group_sum_avg_minmax",   # flagship TPC-H Q1 shape
    "join_inner_equi",            # fact⋈fact shuffle join
    "join_broadcast_dim",         # star join, broadcast dims
    "window_rank_topn_per_group", # window + rank limit
    "window_dedupe_latest",       # pk-latest dedupe
    "agg_rollup_cube",            # grouping sets
    "sort_limit_topk",            # TakeOrderedAndProject
    "fn_date_trunc_month",        # date bucketing KPI
    "text_tokenize_count",        # text analysis scan
    "join_asof",                  # as-of join
    "dedup_minhash_lsh",          # north-star: minhash LSH dedup
    "sim_cosine_topk",            # north-star: similarity search
    # heavy LLM-pipeline path (r3 verdict item 2): the expensive keys,
    # so regressions in the multi-stage path are visible round-over-round
    "dedup_connected_components", # iterative star-contraction CC
    "sim_cosine_ivf_sampled",     # sampled-training IVF ANN (scale path)
    "pipeline_corpus_curate",     # capstone: quality→dedup→CC→split
    "pipeline_corpus_mixture",    # capstone: repetition→dedup→rebalance→split
    # round-6 additions
    "sim_cosine_ann_lsh_multi",   # multi-table LSH union ANN
    "pipeline_pack_sequences",    # sharded-prefix-sum sequence packing
    "multimodal_video_meta",      # MP4 build+parse round trip (Arrow UDF path)
    # round-7 additions
    "text_tfidf_topk",            # tokenize→tf/df rejoin→WindowGroupLimit
    "ts_resample_gapfill",        # grid densify + forward-fill window
    # round-7 closing-session additions
    "pipeline_chunk_dedup",       # chunk-granularity hash dedup
    "agg_hll_partial_merge",      # re-aggregatable sketch cascade
    # round-7 final-session additions
    "agg_star_multijoin",         # TPC-H Q5 shape: 6-table star join
    "graph_triangle_count",       # wedge-join triangle counting
    "ts_ohlc_bars",               # partial-aggregable OHLC downsample
    # round-8 additions
    "dedup_incremental_index",    # cross-batch dedup vs bucketed band index
    "pipeline_medallion_e2e",     # bronze→silver→gold lifecycle
    "text_bpe_train",             # 8-round iterative BPE training loop
    "dedup_lsh_star_edges",       # skew-safe linear LSH candidates
    # round-8 closing-session additions
    "ml_logreg_train",            # iterative GD classifier training loop
    "dedup_semantic",             # SemDeDup: clustered embedding dedup
    "er_cluster_canonical",       # entity resolution + golden record
    "dedup_semantic_lsh",         # SemDeDup scale path: LSH candidates
    "dedup_winnowing",            # MOSS winnowing fingerprint pairs
    "ml_naive_bayes",             # exact-integer-grid NB classifier
    "sim_ivfpq_topk",             # composed IVF-prune + PQ-ADC ANN
    "dedup_index_compact",        # append + bucket-preserving compaction + probe
    "text_unigram_train",         # unigram-LM tokenizer Viterbi-EM trainer
    "sim_ivfpq_rerank",           # IVFPQ + exact top-R re-ranking
    # round-10 additions
    "sim_ivfpq_reindex_swap",     # retrain + re-encode + atomic index swap
    "pipeline_vector_ingest",     # CDC batch -> dedup gate -> frozen encode -> append -> probe
    # round-11 additions
    "dedup_substring_exact",      # overlapping-k-gram exact substring dedup
    "text_wordpiece_train",       # 8-round likelihood-scored merge trainer
    "sim_opq_topk",               # variance-permutation OPQ + PQ ADC
    # round-11 second-wave additions (corpus-filter frontier)
    "text_perplexity_filter",     # CCNet LM scoring + per-lang terciles
    "sample_dsir",                # hashed-bigram importance resampling
    "pipeline_filter_funnel",     # gopher -> perplexity -> dedup attrition
    "multimodal_phash_dedup",     # banded perceptual-hash image near-dup
    # round-12 additions
    "sim_range_search_scaled",    # occupancy-dialed radius search (n_planes ~ log2 N)
    "sample_kcenter_batched",     # O(K*N) running-min-dist greedy coreset
    "sim_ivf_graph_topk",         # per-list graph beam-search ANN serving
    "text_tokenize_e2e",          # BPE train -> apply -> sequence pack
    "dedup_decontaminate",        # eval-overlap gram decontamination
    "sink_scd2_history",          # 3-generation type-2 SCD merge sink
    "pipeline_rag_query",         # IVF probe -> chunk cap -> budgeted context
    "sim_ivf_graph_scaled",       # list-count-dialed graph-ANN serving
    # round-13 additions
    "sim_range_search_recall_held",  # recall-held radius search (T from recall target)
    "sim_ivf_graph_multi_entry",     # multi-entry graph walk at the measured sweet spot
    # round-14 additions
    "pipeline_llm_corpus_e2e",       # capstone: funnel -> classifier -> decon -> BPE+pack -> epochs
    "multimodal_pair_cluster",       # cross-modal transitive cluster dedup (CC over verified pairs)
    # round-15 additions
    "sim_ivf_graph_adaptive",        # margin-gated multi-probe + annealed per-query beam
    "dedup_cluster_rep_quality",     # CC clusters electing the best-quality rep
]


# Host-load self-adjudication (VERDICT r14 #4): a loaded driver host
# inflates timings uniformly and forces a human to adjudicate against
# the variance priors by hand. The bench now (a) waits briefly for the
# host to go idle (bounded — never blocks the driver for long), (b)
# stamps a loaded_host flag when it could not, and (c) emits a per-key
# vs_fence verdict computed from the committed fresh-JVM priors so the
# artifact adjudicates itself.
LOAD_IDLE_THRESHOLD = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.5"))
LOAD_WAIT_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAITS", "6"))
LOAD_WAIT_SECONDS = 20.0


def wait_for_idle_host() -> tuple[float, float, bool]:
    """Bounded idle-wait: poll the 1-minute load average up to
    LOAD_WAIT_ATTEMPTS times, LOAD_WAIT_SECONDS apart, until it drops
    under LOAD_IDLE_THRESHOLD. Returns (final_load, waited_s, loaded)."""
    waited = 0.0
    load = os.getloadavg()[0]
    for _ in range(LOAD_WAIT_ATTEMPTS):
        if load < LOAD_IDLE_THRESHOLD:
            break
        print(
            f"# host loaded (load_avg_1m={load:.2f} >= {LOAD_IDLE_THRESHOLD}); "
            f"waiting {LOAD_WAIT_SECONDS:.0f}s",
            file=sys.stderr,
        )
        time.sleep(LOAD_WAIT_SECONDS)
        waited += LOAD_WAIT_SECONDS
        load = os.getloadavg()[0]
    return load, waited, load >= LOAD_IDLE_THRESHOLD


# Self-normalizing controls (VERDICT r15 #1): 2-3 pinned, never-touched
# trivial keys whose committed idle-host reference times travel with the
# repo (docs/bench_controls.json). The stdout line carries
# control_ratio = geomean(now / reference) over them, so a host-epoch
# drift (r15: ~25% uniform inflation that took an out-of-band worktree
# re-bench to prove) is machine-readable from the driver artifact
# alone: per-key ratios ~control_ratio ⇒ ambient, not code.
CONTROL_KEYS = ["sort_limit_topk", "fn_date_trunc_month", "agg_group_sum_avg_minmax"]


def load_control_refs() -> dict[str, float]:
    """Committed idle-host reference seconds for the control keys."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "docs", "bench_controls.json"
    )
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    if doc.get("sf_dir", "/root/testdata/sf0.1") != "/root/testdata/sf0.1":
        return {}
    return {k: float(v) for k, v in doc.get("controls", {}).items()}


def load_fence_priors() -> dict[str, dict]:
    """Newest committed fresh-JVM variance prior per key, scanned from
    docs/bench_variance_*.json in name order (later rounds win). Only
    priors measured at the default sf0.1 dir apply."""
    import glob

    docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs")
    priors: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(docs, "bench_variance_*.json"))):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        if doc.get("sf_dir", "/root/testdata/sf0.1") != "/root/testdata/sf0.1":
            continue
        for key, stats in doc.get("keys", {}).items():
            if "hi_fence" in stats:
                priors[key] = {
                    "hi_fence": stats["hi_fence"],
                    "lo_fence": stats.get("lo_fence"),
                    "prior": os.path.basename(path),
                }
    return priors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    load_after_wait, idle_waited_s, loaded_host = wait_for_idle_host()

    spark = get_spark(app_name="mercurygate_spark_bench")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warmup: run every headline query once at the smallest SF — warms
    # JVM classloading, whole-stage-codegen compilation for each plan
    # shape, and Python workers, so timings measure steady-state
    # engine throughput rather than first-call JIT cost.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).count()
        except Exception:
            pass

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in names:
        per_run, n = [], 0
        for _ in range(runs):
            t0 = time.perf_counter()
            n = queries[name](spark, sf_dir).count()
            per_run.append(round(time.perf_counter() - t0, 3))
        # headline stays best-of-N (rejects transient stalls); the raw
        # runs + mean are recorded too so a sustained tail regression
        # (2 of 3 runs slow) is still visible in the JSON (ADVICE r3)
        timings[name] = min(per_run)
        all_runs[name] = per_run
        print(f"# {name}: best-of-{runs} {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    full = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "query_runs": all_runs,
        "query_means": {k: round(sum(v) / len(v), 3) for k, v in all_runs.items()},
        # medians resist both transient stalls AND the one-fast-
        # run flattery that best-of-N gives; with the raw runs
        # above, round-over-round drift can be judged against
        # actual spread (scripts/bench_variance.py does this
        # with fresh-JVM isolation per key).
        "query_medians": {
            k: round(statistics.median(v), 3) for k, v in all_runs.items()
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": runs,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "load_avg_1m_start": round(load_after_wait, 2),
        "idle_waited_s": idle_waited_s,
        "loaded_host": bool(loaded_host),
    }
    # host-epoch control ratio (never-touched keys vs committed refs)
    if sf_dir.rstrip("/") == "/root/testdata/sf0.1":
        refs = load_control_refs()
        cr = [
            timings[k] / refs[k]
            for k in CONTROL_KEYS
            if k in timings and refs.get(k)
        ]
        if cr:
            import math

            full["control_ratio"] = round(
                math.exp(sum(math.log(r) for r in cr) / len(cr)), 3
            )
            full["control_keys"] = [k for k in CONTROL_KEYS if refs.get(k)]
    # per-key fence adjudication: fences are fresh-JVM medians/IQR, a
    # warm shared-JVM best-of-N should sit at or below them — a key
    # above its hi-fence on an idle host is a real drift signal; on a
    # loaded host the loaded_host flag explains it.
    if sf_dir.rstrip("/") == "/root/testdata/sf0.1":
        priors = load_fence_priors()
        vs_fence = {}
        above = []
        for name, t in timings.items():
            p = priors.get(name)
            if not p:
                continue
            ratio = round(t / p["hi_fence"], 3)
            vs_fence[name] = {
                "hi_fence": p["hi_fence"],
                "ratio_vs_hi_fence": ratio,
                "above": ratio > 1.0,
                "prior": p["prior"],
            }
            if ratio > 1.0:
                above.append(name)
        full["vs_fence"] = vs_fence
        full["keys_above_fence"] = above
    # The driver captures only the last 2000 chars of stdout; the full
    # doc (~6 KB with per-run arrays) got front-truncated into an
    # unparseable tail in round 10 ("parsed": null). Parse-proofing:
    # persist the FULL doc to docs/bench_local_latest.json, and print a
    # COMPACT line (no per-run arrays/means/medians — those live in the
    # artifact, which each round commits as docs/bench_r{N}_local.json)
    # small enough to survive the tail capture intact.
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "docs", "bench_local_latest.json"
    )
    try:
        with open(artifact, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError as exc:  # bench must still emit its line read-only
        print(f"# artifact write failed: {exc}", file=sys.stderr)
    slim = {
        k: v
        for k, v in full.items()
        if k
        not in ("query_runs", "query_means", "query_medians", "vs_fence",
                "control_keys")
    }
    # the slim line must keep "queries" under the 2000-char tail
    # window: emit the self-adjudication fields only when they carry
    # signal (full detail always lives in the artifact)
    if not slim.get("loaded_host"):
        slim.pop("loaded_host", None)
    if not slim.get("idle_waited_s"):
        slim.pop("idle_waited_s", None)
    above_keys = slim.pop("keys_above_fence", None)
    if above_keys:
        slim["n_above_fence"] = len(above_keys)  # names in the artifact
    slim.pop("load_avg_1m_start", None)
    # 2-decimal per-key timings on the line (3-decimal in the artifact):
    # ~60 chars of headroom that keeps "queries" intact as keys grow
    slim["queries"] = {k: round(v, 2) for k, v in slim["queries"].items()}
    slim["artifact"] = "docs/bench_local_latest.json"
    # "queries" is part of the driver CONTRACT — when the line outgrows
    # the 2000-char stdout tail window, shed the OPTIONAL fields first
    # (they all live in the artifact); dropping "queries" is the very
    # last resort (it fired silently in r15 when the 63-key line +
    # optional fields crossed 1900, costing the driver its per-key data)
    line = json.dumps(slim, separators=(",", ":"))
    for opt in ("artifact", "n_above_fence", "load_avg_1m", "loaded_host",
                "idle_waited_s", "runs_per_query"):
        if len(line) <= 1900:
            break
        slim.pop(opt, None)
        line = json.dumps(slim, separators=(",", ":"))
    if len(line) > 1900:  # still must fit the 2000-char tail window
        slim.pop("queries", None)
        line = json.dumps(slim, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
