"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thrill_spark.plans.queries import ORACLES, QUERIES  # noqa: E402

# The driver's correctness gate checks the FIRST 50 registry entries.
# Round-4 rotation: rounds 1-3 hard-verified 96 distinct queries; the
# 35 below are everything that has only ever had the repo-local
# differential (tests/test_oracle_queries.py — the identical check at
# sf0.001/0.01). They take the window first; the tail re-verifies the
# strongest round-3 evidence (events family, dedup pipeline, real PNG
# decode) plus the round-4 additions as they land.
_NEVER_DRIVER_VERIFIED = [
    # IO round-trips (lines/binary/csv/json/orc/gz/glob/partition-pruned)
    "io_lines_roundtrip",
    "io_binary_roundtrip",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "io_orc_roundtrip",
    "io_gz_lines_roundtrip",
    "io_lines_one_glob_roundtrip",
    "io_partitioned_pruned_scan",
    # Structured Streaming with hard oracles (stream ≡ batch)
    "events_stream_tumbling",
    "events_stream_stateful_counts",
    # function-family audits not yet in a window
    "fn_approx_quantiles",
    "fn_collect_aggs",
    "fn_math_ops",
    "fn_struct_map_ops",
    "fn_conditional_null_ops",
    "fn_regex_ops",
    # ordered / sampling / plumbing ops
    "sort_stable_priority",
    "prefix_scan_running_min",
    "sample_exact_k",
    "sample_exact_k_hypergeometric",
    "rebalance_partitions",
    "group_fold_order_gaps",
    "bucketed_join_colocated",
    # corpus + text pipeline
    "corpus_build_e2e",
    "corpus_decontaminate",
    "text_pii_redact",
    "doc_fingerprint_winnow",
    # similarity / multimodal
    "similarity_ann_ivf",
    "multimodal_features",
    "multimodal_audio_chunks",
    "multimodal_frame_sample",
    "multimodal_resize_meta",
    # iterative algorithms (property oracles)
    "pagerank",
    "kmeans_clusters",
    "suffix_array_doc0",
]

# Tail: round-4 additions (driver-verify new work first) + hedge
# re-verification of the round-3 window's highest-value queries.
_WINDOW_TAIL = [
    # round-4 additions
    "dedup_bloom_prefilter",
    "text_bpe_tokenize",
    "text_unigram_rarity",
    "dedup_paragraph_boilerplate",
    "events_stream_join",
    "events_stream_dedup",
    "similarity_knn_join",
    "fn_url_json_ops",
    "corpus_quota_interleave",
    "text_minhash_containment",
    "text_heavy_hitters",
    "events_multires_rollup",
    # corpus-mining batch (this round): chunking, tf-idf pairs,
    # incremental dedup, cohort retention, z-order layout
    "text_chunk_overlap",
    "text_tfidf_pairs",
    "dedup_incremental",
    "events_user_retention",
    "layout_zorder_stats",
]

# Queued for the NEXT window rotation (registered + locally green this
# round, but past the 50-entry cut): dedup_semantic_keep,
# fn_higher_order_array, fn_window_frames, fn_stats_exact,
# fn_string_distance, corpus_weighted_sample, profile_orders,
# k_core_orders, events_stream_sessionize, multimodal_real_resize,
# multimodal_real_wav_decode, events_hll_mergeable,
# ml_quantile_binning, ml_feature_hashing, dedup_cluster_histogram,
# merge_upsert_orders, scd2_orders_status, events_gap_fill,
# events_attribution_last_touch, events_rolling_hour_counts,
# dedup_fuzzy_levenshtein — plus the advanced-curation session's 50+
# additions (text_bigram_lm, dedup_ngram_cover, ml_pca_power_iteration,
# similarity_rp_ann, interval_join_promotions, events_stream_upsert /
# _restart_exactly_once / _enrich, io_python_datasource_lines,
# layout_hilbert_stats, events_kmv_sketch, fn_weighted_median, ...);
# all have the identical local differential at sf0.001+sf0.01 and a
# 24-query sf0.1 sweep (BENCH_NOTES.md).
_DRIVER_WINDOW_PRIORITY = (_NEVER_DRIVER_VERIFIED + _WINDOW_TAIL)[:50]
assert len(_DRIVER_WINDOW_PRIORITY) == 50


def _ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Tolerate priority names that land later in the round; the window
    # is whatever exists of the priority list, topped up in registry
    # order.
    out = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's TPC-H acceptance workload
    (lineitem ⋈ orders + aggregation, examples/tpch/tpch_run.cpp:248-255)
    on /root/testdata/sf0.001."""
    return QUERIES["inner_join_lineitem_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for randomized /
    approximate ops → driver records a rows-only check)."""
    qs = _ordered_queries()
    return {n: ORACLES[n] for n in qs if n in ORACLES}
