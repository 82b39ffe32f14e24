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
# Rounds 1-2 verified the §2 basics (reduce/join/zip/window/...); this
# round rotates the so-far-unverified surface into that window: the
# repaired events family, the full TPC-H suite, function-family audits,
# corpus ops, the dedup pipeline, asof/range/salted joins, and the
# deterministic graph/selection algorithms. Everything else keeps the
# repo-local differential (tests/test_oracle_queries.py, same check).
_DRIVER_WINDOW_PRIORITY = [
    # events family — broken in r2 by the TIMESTAMP(NANOS) runtime
    # drift, fixed in catalog.py; needs the hard signal back.
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_sessionize",
    "events_json_props",
    "events_funnel_view_click_purchase",
    # full TPC-H suite (queries_tpch_full.py) — never driver-verified
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
    # function-family audits
    "fn_string_ops",
    "fn_datetime_ops",
    "fn_array_ops",
    "fn_ranking_windows",
    "fn_bitwise_hash_ops",
    "fn_percentiles_exact",
    # round-3 multimodal + SGD proofs (real PNG decode kernel; planted
    # logistic regression) — strongest new evidence, driver-verify first.
    # fn_conditional_null_ops / fn_regex_ops rotate to the local
    # differential to make room (green there since round 2).
    "multimodal_real_png_decode",
    "logreg_sgd_planted",
    # corpus management + dedup pipeline
    "corpus_split_assign",
    "corpus_stratified_sample",
    "corpus_shuffle_index",
    "corpus_pack_greedy",
    "dedup_pipeline_survivors",
    "dedup_cluster_assign",
    "dedup_embedding_cosine",
    "text_repetition_scores",
    # join specializations
    "asof_join_purchase_click",
    "range_join_price_bands",
    "salted_join_lineitem_supplier",
    "salted_agg_events",
    # deterministic algorithm workloads
    "triangle_count",
    "bfs_distances",
    "kth_statistic",
]
assert len(_DRIVER_WINDOW_PRIORITY) == 50

# Round-4 rotation plan: after CORRECTNESS_r03 lands, swap these
# never-driver-verified queries (33 as of round-3 close; all green in
# the identical local differential) into the window, displacing
# already-hard-verified entries:
#   io_* round-trips (7 incl. orc/gz/partitioned), fn_* additions
#   (approx_quantiles/collect_aggs/math/struct_map/conditional/regex),
#   events_stream_tumbling + events_stream_stateful_counts,
#   corpus_build_e2e, corpus_decontaminate, text_pii_redact,
#   bucketed_join_colocated, rebalance_partitions, group_fold_order_gaps,
#   doc_fingerprint_winnow, sort_stable_priority, prefix_scan_running_min,
#   sample_exact_k (+_hypergeometric), similarity_ann_ivf,
#   multimodal_features/audio_chunks/frame_sample, pagerank,
#   kmeans_clusters, suffix_array_doc0.


def _ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
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
