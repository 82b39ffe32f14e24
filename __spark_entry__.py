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
# Round-5 rotation (per VERDICT r4 "Next round" #1): 50 first-time
# names — the 7 r4-built-but-never-windowed queries at the head, then
# the events-analytics family, the streaming jobs, and the
# corpus/curation/dedup never-verified set. Every name already has the
# identical local differential green at sf0.001 + sf0.01 + sf0.1
# (tests/test_oracle_queries.py + tools/validate_sf.py).
_R5_WINDOW = [
    # r4-built, never windowed
    "similarity_pq_ann",
    "events_cms_frequency",
    "er_customer_linkage",
    "events_stream_outer_join",
    "multimodal_silence_segments",
    "fn_generators",
    "corpus_dsir_select",
    # events analytics (batch)
    "events_sliding_distinct_users",
    "events_sessionize_capped",
    "events_session_window_builtin",
    "events_hll_mergeable",
    "events_gap_fill",
    "events_attribution_last_touch",
    "events_attribution_first_touch",
    "events_attribution_linear",
    "events_rolling_hour_counts",
    "events_user_retention",
    "events_kmv_sketch",
    "events_burst_detection",
    "events_funnel_view_click_purchase",
    "events_funnel_in_session",
    "events_top_types_per_hour",
    "events_decay_counters",
    "events_anomaly_mad",
    "events_histogram_quantile",
    "events_time_weighted_avg",
    "events_conversion_latency",
    "events_incremental_rollup",
    "events_gaps_and_islands",
    "events_markov_transitions",
    "events_seasonality_profile",
    "events_ab_experiment",
    "events_watermark_lateness",
    # streaming jobs (stream ≡ batch oracles)
    "events_stream_sessionize",
    "events_stream_upsert",
    "events_stream_restart_exactly_once",
    "events_stream_enrich",
    # corpus / curation / dedup never-verified
    "dedup_pipeline_survivors",
    "dedup_ngram_cover",
    "dedup_simhash_hamming",
    "dedup_fuzzy_levenshtein",
    "dedup_cluster_histogram",
    "corpus_epoch_shuffles",
    "corpus_pack_greedy",
    "corpus_temperature_mix",
    "corpus_span_corruption",
    "corpus_dataset_card",
    "corpus_decontaminate_substring",
    "corpus_quota_apportionment",
    "text_gopher_gate",
]

# r6 window plan (swap in at round-6 start; ~85 never-verified remain
# after r5, so r6 takes 50 and r7 closes the tail). r6 (~50):
# graph/ml (graph_scc, graph_label_propagation, graph_link_prediction,
# graph_degree_distribution, k_core_orders, sssp_weighted_dag,
# ml_pca_power_iteration, ml_quantile_binning, ml_feature_hashing,
# ml_negative_sampling, ml_embedding_quantize, ml_random_projection,
# ml_groupwise_ols, ml_eval_confusion, ml_feature_label_covariance),
# suffix family tail (suffix_bwt_doc0, suffix_rlbwt_doc0,
# suffix_lcp_doc0, suffix_wavelet_doc0, suffix_array_quadrupling_doc0),
# joins (asof_join_purchase_click, asof_join_next_click,
# range_join_price_bands, interval_join_promotions,
# salted_join_lineitem_supplier, salted_agg_events,
# merge_upsert_orders, scd2_orders_status), io extras
# (io_xml_roundtrip, io_datasource_write_roundtrip,
# io_python_datasource_lines, io_datasource_wordcount,
# io_compact_small_files, io_manifest_roundtrip, io_schema_evolution,
# io_snapshot_diff, io_csv_corrupt_records,
# io_dynamic_partition_pruning, plus the round-5 additions
# io_xz_lines_roundtrip and suffix_array_dc7), layout (layout_zorder_stats,
# layout_hilbert_stats), profile (profile_orders, profile_key_skew,
# profile_join_cardinality, profile_data_quality,
# profile_source_drift), multimodal (multimodal_real_png_decode,
# multimodal_real_resize, multimodal_real_wav_decode,
# multimodal_phash_dedup, multimodal_wav_frame_energy). r7 tail:
# remaining corpus/text/dedup/events (corpus_split_assign,
# corpus_stratified_sample, corpus_shuffle_index, corpus_weighted_sample,
# corpus_token_budget, corpus_leakage_check, corpus_chunk_dedup_pack,
# corpus_length_buckets, corpus_dedup_by_source, corpus_sft_pairs,
# corpus_curation_full, corpus_vocab_growth, text_repetition_scores,
# text_loop_artifacts, text_url_canonicalize, text_bigram_lm,
# text_lexical_diversity, text_compression_ratio,
# text_keyword_extraction, dedup_cluster_assign, dedup_embedding_cosine,
# dedup_semantic_keep, dedup_quality_survivors, dedup_threshold_sweep,
# similarity_rp_ann, similarity_overlap_at_k, fn_variant_ops,
# cluster_topic_cards, basket_frequent_pairs, skyline_price_quantity,
# customer_rfm_segments, customer_cohort_ltv, part_abc_analysis,
# nation_revenue_yoy, orders_backlog_daily) plus any r5/r6 additions.
_DRIVER_WINDOW_PRIORITY = _R5_WINDOW[:50]
assert len(_DRIVER_WINDOW_PRIORITY) == 50, len(_DRIVER_WINDOW_PRIORITY)


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
