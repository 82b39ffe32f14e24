"""Physical-plan discipline tests: the plan properties that decide
whether a query survives a 100 TB / 1000-executor scale-up, asserted on
the actual executed plans at sf0.001.

- filters/projections must reach the parquet scan (PushedFilters /
  ReadSchema column pruning),
- dimension joins must broadcast (no shuffle of nation/region/part
  subsets), equi-joins must never degrade to nested-loop,
- ordered-array ops must not funnel data through a single partition
  (no `Exchange SinglePartition` except the final scalar/limit step).
"""

import pytest

from thrill_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    # only the 4 referenced columns may be read from an 11-column table
    assert "l_extendedprice" in read and "l_discount" in read
    for unused in ("l_returnflag", "l_tax", "l_partkey", "l_orderkey"):
        assert unused not in read, f"scan reads unused column {unused}"


@pytest.mark.parametrize(
    "name",
    ["tpch_q5_local_supplier_volume", "tpch_q8_market_share", "tpch_q10_returned_items"],
)
def test_dimension_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: equi-join degraded to NLJ"
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "prefix_sum_totalprice",
        "zip_with_index_orders",
        "window_sliding_sum",
        "window_disjoint_blocks",
        "group_fold_order_gaps",
        "reduce_by_key_pricing",
        "inner_join_lineitem_orders",
        "dedup_minhash_signatures",
    ],
)
def test_no_single_partition_exchange(spark, name):
    """The ordered-array discipline (two-phase offsets) must keep every
    wide stage hash/range partitioned — a SinglePartition exchange is a
    100 TB bottleneck. (Scalar-output aggs and global limits are the
    allowed exception; none of these queries is one.)"""
    plan = _plan(spark, name)
    assert "Exchange SinglePartition" not in plan, f"{name}: single-partition funnel"


def test_semi_anti_joins_stay_hash_joins(spark):
    for name in ("tpch_q4_order_priority", "tpch_q21_waiting_orders",
                 "anti_join_customers_without_orders"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: NLJ in semi/anti plan"
        assert "CartesianProduct" not in plan
