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
# Round-4 rotation (per VERDICT r3 "Next round" #1-#3): the full
# 22-query TPC-H suite (the reference's own acceptance workload,
# examples/tpch/tpch_run.cpp:175-255) + the 2 round-3 reds (now
# array-free) + the 14 never-windowed fn_* families + the 4
# never-windowed §2.13 examples + the 4 events batch queries whose
# last official record is r2's catalog-regression FAIL.
_NEVER_DRIVER_VERIFIED = [
    # Fixed round-3 reds (arrays now serialized on both engines)
    "fn_collect_aggs",
    "doc_fingerprint_winnow",
    # Full TPC-H suite — never inside a driver window before
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q20_excess_stock_suppliers",
    "tpch_q21_waiting_orders",
    "tpch_q22_global_sales_opportunity",
    # Remaining fn_* families never in a window (array outputs audited
    # repo-wide: all oracle queries are scalar-typed as of r4)
    "fn_array_ops",
    "fn_array_sort_comparator",
    "fn_bitwise_hash_ops",
    "fn_datetime_ops",
    "fn_higher_order_array",
    "fn_json_shred_nested",
    "fn_map_higher_order",
    "fn_percentiles_exact",
    "fn_ranking_windows",
    "fn_stats_exact",
    "fn_string_distance",
    "fn_string_ops",
    "fn_weighted_median",
    "fn_window_frames",
    # §2.13 examples never in a window
    "kth_statistic",
    "triangle_count",
    "bfs_distances",
    "logreg_sgd_planted",
    # events batch family: last driver record is r2's FAIL (the
    # TIMESTAMP(NANOS) catalog regression, fixed in r3) — supersede it
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_sessionize",
    "events_json_props",
]

# Tail: round-4 additions (driver-verify new work first). The other
# r4 additions (similarity_pq_ann, events_cms_frequency,
# er_customer_linkage, events_stream_outer_join,
# multimodal_silence_segments, fn_generators, corpus_dsir_select)
# queue at the head of the r5 window below.
_WINDOW_TAIL = [
    "io_lines_sized_roundtrip",
    "io_bz2_lines_roundtrip",
    "suffix_array_dc3",
    "dedup_cdc_chunks",
]

# r5/r6 rotation plan (VERDICT #4 — every registry query gets a driver
# row within two more rounds). r5 window (~50): the events analytics
# family (events_sliding_distinct_users, events_sessionize_capped,
# events_session_window_builtin, events_hll_mergeable, events_gap_fill,
# events_attribution_last_touch / _first_touch, events_rolling_hour_counts,
# events_user_retention, events_kmv_sketch, events_burst_detection,
# events_funnel_steps, events_stream_sessionize / _upsert /
# _restart_exactly_once / _enrich, ...) + corpus/curation never-verified
# (corpus_epoch_shuffle, corpus_pack_sequences, corpus_temperature_mix,
# corpus_span_corruption, corpus_dataset_card, dedup_pipeline_survivors,
# dedup_ngram_cover, dedup_simhash_*, dedup_hamming_ball,
# dedup_cluster_histogram, dedup_fuzzy_levenshtein, text_bigram_lm,
# text_gopher_gate, text_lexical_diversity, ...). r6 window (~50):
# graph/ml (ml_pca_power_iteration, ml_quantile_binning,
# ml_feature_hashing, label_propagation, k_core, sssp, connected
# components shapes), layout (layout_zorder_stats, layout_hilbert_stats),
# io extras (io_python_datasource_lines, io_datasource_wordcount,
# compact_files path), profile/skew family, merge_upsert_orders,
# scd2_orders_status, interval_join_promotions, salted joins, plus any
# r5/r6 additions. All already have the identical local differential at
# sf0.001 + sf0.01 (tests/test_oracle_queries.py + tools/validate_sf.py).
_DRIVER_WINDOW_PRIORITY = (_NEVER_DRIVER_VERIFIED + _WINDOW_TAIL)[:50]
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
