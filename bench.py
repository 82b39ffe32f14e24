#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set mirrors the reference's own benchmark programs (BASELINE.md):
wordcount (examples/word_count), join+agg (examples/tpch), global sort
(benchmarks/api/sort.cpp), groupby median (benchmarks/api/groupby.cpp),
prefix-sum / window over _idx, plus the LLM-pipeline extensions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thrill_spark.plans.queries import QUERIES  # noqa: E402
from thrill_spark.session import get_spark  # noqa: E402
from thrill_spark import ordering as _ordering  # noqa: E402

BENCH_QUERIES = [
    "reduce_by_key_pricing",
    "inner_join_lineitem_orders",
    "flatmap_wordcount",
    "group_by_key_median",
    "sort_top_orders",
    "zip_with_index_orders",
    "prefix_sum_totalprice",
    "window_sliding_sum",
    "window_disjoint_blocks",
    "reduce_to_index_nation",
    "merge_sorted_halves",
    "left_join_customer_orders",
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume_customers",
    # LLM-pipeline surface (VERDICT r1 item 7): track round-over-round
    # perf of the training-data operators, not just classic analytics.
    "dedup_exact",
    "dedup_lsh_candidate_pairs",  # minhash -> band -> bucket join, end-to-end
    "dedup_simhash",
    "dedup_embedding_cosine",  # distributed block-matmul near-dup path
    "similarity_cosine_topk",
    "events_sessionize",
    # derived-partsupp TPC-H additions
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    # corpus-management surface (round 2): dataset assembly ops
    "text_repetition_scores",
    "corpus_shuffle_index",
    "corpus_pack_greedy",
    # flagship composition: LSH dedup -> verify -> CC -> survivors
    "dedup_pipeline_survivors",
    # round 3: real PNG decode kernel (mapInPandas hot path) and the
    # as-of join (distributed carry) — track both round-over-round.
    "multimodal_real_png_decode",
    "asof_join_purchase_click",
    # round 4: bloom dup-detection prefilter, exact k-NN join (block
    # matmul + per-block top-k), BPE tokenize (train + Arrow apply),
    # segment boilerplate removal, unigram rarity scoring.
    "dedup_bloom_prefilter",
    "similarity_knn_join",
    "text_bpe_tokenize",
    "dedup_paragraph_boilerplate",
    "text_unigram_rarity",
    # corpus-mining batch: integer TF-IDF pair similarity, incremental
    # batch-vs-corpus dedup, overlap chunking, Z-order layout stats.
    "text_tfidf_pairs",
    "dedup_incremental",
    "text_chunk_overlap",
    "layout_zorder_stats",
    # round-3 continuation: semantic dedup, graph peel, CDC merge,
    # time-series gap fill, edit-distance verify.
    "dedup_semantic_keep",
    "k_core_orders",
    "merge_upsert_orders",
    "events_gap_fill",
    "dedup_fuzzy_levenshtein",
    # advanced-curation batches: bigram LM, substring-cover dedup,
    # fixed-point PCA, JL-bucket ANN, interval-overlap join.
    "text_bigram_lm",
    "dedup_ngram_cover",
    "ml_pca_power_iteration",
    "similarity_rp_ann",
    "interval_join_promotions",
    # round 4: CDC chunk dedup (scan-only chunking + hash groupBy),
    # PQ-ANN (code-scan ADC + rescore), Count-Min point queries,
    # blocking+scoring entity resolution.
    "dedup_cdc_chunks",
    "similarity_pq_ann",
    "events_cms_frequency",
    "er_customer_linkage",
]

# Second headline set (VERDICT r8 item 5): the r5-r7 families the
# r1-comparable line above never covered — suffix/FM/LCS structures,
# theta sketch set-ops, A-Priori, rollup/cube, zonemap pruning, and
# the r7 analytics batch. Recorded as its own `headline_v2` JSON line
# (second-to-last stdout line) so the original 51-query series stays
# round-over-round comparable while these get a perf record too.
BENCH_QUERIES_V2 = [
    # r13: build-once FM index — the build bears the suffix-sort
    # ladder cost ONCE; count/locate below consume the materialized
    # parquet (the r12 pair re-ran the ladder per query).
    "suffix_fm_build",
    "suffix_fm_count_doc0",
    # r13: generalized (multi-document) corpus FM index — build +
    # attributed locate (the decontamination probe shape).
    "suffix_fm_corpus_build",
    "suffix_fm_corpus_locate",
    "suffix_fm_decontaminate",
    "suffix_lcs_doc01",
    "suffix_lcp_partnames",
    "suffix_wavelet_partnames",
    "events_theta_setops",
    "events_histogram_quantiles",
    "events_seq_pattern_support",
    "events_cusum_change_detection",
    "basket_apriori_triples",
    "orders_rollup_revenue",
    "lineitem_cube_flags",
    "layout_zonemap_pruning",
    "text_inverted_index_search",
    "ml_token_vote_classifier",
    "profile_benford_totalprice",
    "window_sliding_partial_tail",
    # r9-built: true ExactSubstr cross-doc dedup (generalized SA +
    # LCP islands) and the FM/SA consumers added this round
    "dedup_exact_substr_sa",
    "suffix_fm_locate_doc0",
    "suffix_longest_repeat_doc0",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, sf_dir)
    # Force full materialization without driver transfer of all rows.
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


_GROUP_SEQ = [0]


def run_query_with_metrics(spark, name: str, sf_dir: str):
    """Run under a dedicated job group and return (seconds, metrics):
    jobs/stages/tasks counts from the status tracker, so a wall-clock
    drift decomposes into scheduler pressure (stage/task explosion)
    vs per-task work (counts flat, time up) round-over-round."""
    sc = spark.sparkContext
    _GROUP_SEQ[0] += 1
    group = f"bench:{name}:{_GROUP_SEQ[0]}"  # unique per invocation —
    # reusing one group would accumulate jobs across the 3 passes
    sc.setJobGroup(group, name, interruptOnCancel=False)
    try:
        t = run_query(spark, name, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    st = sc.statusTracker()
    stage_ids: set[int] = set()
    n_jobs = 0
    n_tasks = 0
    for jid in st.getJobIdsForGroup(group):
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        n_jobs += 1
        for sid in ji.stageIds:
            if sid in stage_ids:
                continue
            stage_ids.add(sid)
            si = st.getStageInfo(sid)
            if si is not None:
                n_tasks += si.numTasks
    return t, {"jobs": n_jobs, "stages": len(stage_ids), "tasks": n_tasks}


# The driver captures only the LAST ~2000 chars of stdout and parses the
# final line as the bench record. Round 5 shipped `parsed: null` because
# stage_counts shared the final JSON line and pushed it to ~4.9 KB, cutting
# off the head. Contract now: diagnostics (stage_counts, errors) go to
# EARLIER stdout lines + a side file; the FINAL line is the compact
# {metric, value, unit, queries, sf} object, hard-capped below the window.
FINAL_LINE_MAX = 1900


def _capped_record(
    metric: str,
    timings: dict[str, float],
    sf,
    error_count: int,
    max_len: int = FINAL_LINE_MAX,
) -> str:
    """One standalone JSON line under `max_len` chars: if full
    per-query timings don't fit, trim to the slowest movers (detail
    survives in bench_detail.json)."""
    out = {
        "metric": metric,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if error_count:
        out["error_count"] = error_count
    line = json.dumps(out)
    if len(line) > max_len:
        movers = dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
        )
        while len(line) > max_len and movers:
            movers.pop(next(reversed(movers)))
            out["queries"] = movers
            out["queries_truncated_to_top"] = len(movers)
            line = json.dumps(out)
        if "queries_truncated_to_top" in out:
            # surface the switch so the round workflow notices the
            # official record no longer carries every per-query time
            print(
                f"bench: {metric} line truncated to top "
                f"{out['queries_truncated_to_top']} queries "
                f"(full detail in bench_detail.json)",
                file=sys.stderr,
            )
    if len(line) > max_len:
        # last-resort degrade (pathological sf string): a line MUST
        # always be emitted — drop per-query detail, keep the record
        out.pop("queries", None)
        out.pop("queries_truncated_to_top", None)
        out["queries_dropped_oversize"] = True
        line = json.dumps(out)
    return line


def format_output(
    timings: dict[str, float],
    sf,
    stage_counts: dict[str, dict],
    errors: dict[str, str],
    v2_timings: dict[str, float] | None = None,
    v1_error_count: int | None = None,
    v2_error_count: int = 0,
) -> tuple[list[str], str]:
    """Return (earlier stdout lines, final stdout line).

    The FINAL line is the r1-comparable headline record (the driver
    parses the last line); the v2 record is the line directly before
    it so both fit the driver's stdout capture window. Each record
    carries only ITS OWN error count so both are self-describing;
    when the caller doesn't split the counts, every entry in `errors`
    is attributed to the v1 line so a failure can never go uncounted."""
    if v1_error_count is None:
        v1_error_count = len(errors)
    earlier: list[str] = []
    if stage_counts:
        earlier.append(json.dumps({"stage_counts": stage_counts}))
    if errors:
        earlier.append(json.dumps({"errors": errors}))
    final = _capped_record(
        "headline_queries_total_runtime", timings, sf, v1_error_count
    )
    if v2_timings or v2_error_count:
        # The driver keeps only the LAST ~2000 stdout chars and parses
        # the final line; the v2 line must fit the window ABOVE the
        # final line or its head gets cut off. VERDICT r14 #8 asked for
        # the whole v2 family in the parsed record — impossible without
        # evicting v1 keys (51 v1 + 23 v2 keys ≈ 2454 chars > the 1900
        # final-line cap, and truncation drops the FASTEST queries,
        # i.e. existing v1 keys = a bench drop). Additions-only
        # compromise: the v1 line is byte-format-identical, and the v2
        # line carries 2-decimal values so ~2x more v2 keys fit the
        # same window (full per-query detail stays in
        # bench_detail.json, committed with the round).
        v2_budget = max(2000 - len(final) - 2, 300)
        earlier.append(
            _capped_record(
                "headline_v2_total_runtime",
                {n: round(t, 2) for n, t in (v2_timings or {}).items()},
                sf,
                v2_error_count, max_len=v2_budget,
            )
        )
    return earlier, final


def _timed_passes(
    spark,
    names: list[str],
    sf_dir: str,
    errors: dict[str, str],
    timings: dict[str, float],
    stage_counts: dict[str, dict],
    passes: int = 3,
) -> None:
    """Interleaved round-robin passes over `names`, per-query min.

    Consecutive-repeat timing pins a query to whatever transient phase
    (GC pause, host noise) it lands in; round-robin passes decorrelate
    that, and the min-over-passes drops slow phases for every query
    equally. Mutates errors/timings/stage_counts in place."""
    for _ in range(passes):
        for name in names:
            try:
                t, metrics = run_query_with_metrics(spark, name, sf_dir)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            if name not in timings or t < timings[name]:
                timings[name] = t
            # plans are deterministic → counts identical across passes;
            # keep the latest (steady-state) observation
            stage_counts[name] = metrics
            _ordering.release_persisted()
            spark.catalog.clearCache()  # drop remaining persists between queries
        names = [n for n in names if n not in errors]
        spark.sparkContext._jvm.System.gc()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("thrill_spark_bench")
    v1_names = set(BENCH_QUERIES)
    names = [n for n in BENCH_QUERIES + BENCH_QUERIES_V2 if n in QUERIES]
    # JVM/codegen warmup: run every query shape on the smallest fixture
    # so measured times are steady-state query times, not JIT noise.
    # A query broken at warmup is excluded from timing and reported in
    # the errors map — one bad query must not zero out the whole bench
    # (round-2 postmortem: events breakage crashed warmup and the round
    # shipped no numbers at all).
    errors: dict[str, str] = {}
    for name in names:
        try:
            run_query(spark, name, "/root/testdata/sf0.001")
        except Exception as exc:  # noqa: BLE001 — harness must degrade
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    names = [n for n in names if n not in errors]
    _ordering.release_persisted()
    spark.catalog.clearCache()
    # Protocol (r10, VERDICT r9 "what's wrong" #1): time the v1 pass to
    # COMPLETION before any v2 query runs, so the r1-comparable v1
    # series stops absorbing the heavy suffix/SA v2 queries' GC and
    # codegen pressure. r9's single interleave of all 70 cost the
    # official v1 record ~20% (81.6 s driver vs 68.7 s judge-idle on
    # identical code).
    timings: dict[str, float] = {}
    stage_counts: dict[str, dict] = {}
    _timed_passes(
        spark, [n for n in names if n in v1_names], sf_dir,
        errors, timings, stage_counts,
    )
    spark.sparkContext._jvm.System.gc()
    # v2 (suffix/mining) queries spread ±1.7-2.5 s across same-HEAD
    # runs at min-of-3 (r11 VERDICT #4/#5 — per-query deltas were
    # unreadable); 5 interleaved passes tighten the min estimate.
    _timed_passes(
        spark, [n for n in names if n not in v1_names], sf_dir,
        errors, timings, stage_counts, passes=5,
    )
    # a query that timed in pass 1 but errored in a later pass must not
    # contribute a partial time to `value` while also being reported as
    # errored — errored names live only in the errors map
    timings = {
        n: round(t, 3) for n, t in timings.items() if n not in errors
    }
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    v1_timings = {n: t for n, t in timings.items() if n in v1_names}
    v2_timings = {n: t for n, t in timings.items() if n not in v1_names}
    # Full detail to a side file (never size-limited).
    detail = {
        "queries": v1_timings,
        "queries_v2": v2_timings,
        "sf": sf_val,
        "stage_counts": stage_counts,
        "errors": errors,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    earlier, final = format_output(
        timings=v1_timings,
        sf=sf_val,
        stage_counts=stage_counts,
        errors=errors,
        v2_timings=v2_timings,
        v1_error_count=sum(1 for n in errors if n in v1_names),
        v2_error_count=sum(1 for n in errors if n not in v1_names),
    )
    for line in earlier:
        print(line)
    print(final)


if __name__ == "__main__":
    main()
