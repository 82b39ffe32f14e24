"""Operator-coverage queries + DuckDB oracle SQL.

Contract (driver-defined): for each name, ``QUERIES[name](spark,
sf_dir)`` returns a DataFrame and ``ORACLES[name]`` is ANSI SQL DuckDB
runs over the same parquet tables; the driver compares row count,
schema, and an order-insensitive value hash.

Determinism discipline (so hashes match bit-for-bit):
- No floating-point *aggregation*: money/quantity sums go through exact
  DECIMAL casts in BOTH engines, cast to DOUBLE only at the end (the
  decimal value is identical, so the nearest-double is identical).
- Hashing uses md5 (present and identical in both engines) — never
  engine-native hash functions.
- Every computed column is aliased identically on both sides.
- Ordered ops define order by a total order (unique key tiebreaker).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from thrill_spark import ordering as O
from thrill_spark.catalog import load_table
from thrill_spark.operators import basic as B
from thrill_spark.operators import join as J
from thrill_spark.operators import reduce as R

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _dbl(c: Column) -> Column:
    return c.cast("double")


# ---------------------------------------------------------------------------
# ReduceByKey — TPC-H Q1-style pricing summary
# (reference: ReduceByKey dia.hpp:900-1172; workload mirrors
#  examples/tpch/tpch_run.cpp lineitem aggregations)
# ---------------------------------------------------------------------------
@query(
    "reduce_by_key_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_reduce_by_key_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = B.filter_rows(li, F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    one = F.lit(1).cast("decimal(18,4)")
    return R.reduce_by_key(
        filtered,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": _dbl(F.sum(_dec("l_quantity"))),
            "sum_base_price": _dbl(F.sum(_dec("l_extendedprice"))),
            "sum_disc_price": _dbl(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 18, 4)))),
            "avg_qty": _dbl(F.sum(_dec("l_quantity"))) / F.count("*").cast("double"),
            "count_order": F.count("*"),
        },
    )


# ---------------------------------------------------------------------------
# InnerJoin — lineitem ⋈ orders (the reference's TPC-H acceptance query,
# examples/tpch/tpch_run.cpp:248-255) + aggregation
# ---------------------------------------------------------------------------
@query(
    "inner_join_lineitem_orders",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = J.inner_join(li, orders.select("l_orderkey", "o_orderpriority"), on=["l_orderkey"])
    one = F.lit(1).cast("decimal(18,4)")
    return R.reduce_by_key(
        joined,
        ["o_orderpriority"],
        {
            "n_items": F.count("*"),
            "revenue": _dbl(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 18, 4)))),
        },
    )


# ---------------------------------------------------------------------------
# Map + Filter (LOps, dia.hpp:357-432)
# ---------------------------------------------------------------------------
@query(
    "map_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS charge,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity > 45.0 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def q_map_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    filtered = B.filter_rows(
        li,
        (F.col("l_quantity") > 45.0)
        & (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")),
    )
    return B.map_rows(
        filtered,
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "charge": _dbl(
                _dec("l_extendedprice")
                * (one - _dec("l_discount", 18, 4))
                * (one + _dec("l_tax", 18, 4))
            ),
            "flag": F.upper("l_returnflag"),
        },
    )


# ---------------------------------------------------------------------------
# FlatMap — WordCount (examples/word_count/word_count.hpp:35-56)
# ---------------------------------------------------------------------------
@query(
    "flatmap_wordcount",
    """
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
    ) WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = B.flat_map(docs, F.split(F.lower("text"), " "), "word")
    words = B.filter_rows(words, F.col("word") != "")
    return R.reduce_by_key(words, ["word"], {"n": F.count("*")})


# ---------------------------------------------------------------------------
# ReducePair — (key, value) pair reduction (dia.hpp:1174-1304)
# ---------------------------------------------------------------------------
@query(
    "reduce_pair_custkey",
    """
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey
    """,
)
def q_reduce_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select("o_custkey", _dec("o_totalprice").alias("v"))
    return R.reduce_pair(pairs, "o_custkey", "v", F.sum("v")).select(
        "o_custkey", _dbl(F.col("v")).alias("total")
    )


# ---------------------------------------------------------------------------
# GroupByKey — exact per-key median (examples/percentiles/percentiles.cpp:60-75)
# ---------------------------------------------------------------------------
@query(
    "group_by_key_median",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("median_price"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Join family beyond the reference (left outer / semi / anti)
# ---------------------------------------------------------------------------
@query(
    "left_join_customer_orders",
    """
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    joined = J.join_dfs(cust, orders, on=["c_custkey"], how="left")
    return joined.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),
        _dbl(F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))).alias(
            "total_spent"
        ),
    )


@query(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return J.join_dfs(cust, orders, on=["c_custkey"], how="left_anti").select("c_custkey", "c_name")


@query(
    "semi_join_parts_ordered",
    """
    SELECT p_brand, COUNT(*) AS n_parts FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    GROUP BY p_brand
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    li = li.select(F.col("l_partkey").alias("p_partkey"))
    return (
        J.join_dfs(part, li, on=["p_partkey"], how="left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.7: Thrill has only bag Union; Spark adds the rest)
# ---------------------------------------------------------------------------
@query(
    "union_bag_counts",
    """
    SELECT k, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
)
def q_union_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return R.reduce_by_key(B.union_bag([cust, supp]), ["k"], {"n": F.count("*")})


@query(
    "set_intersect_except",
    """
    SELECT 'both' AS tag, k FROM (
      SELECT DISTINCT c_nationkey AS k FROM customer
      INTERSECT SELECT DISTINCT s_nationkey AS k FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS tag, k FROM (
      SELECT DISTINCT c_nationkey AS k FROM customer
      EXCEPT SELECT DISTINCT s_nationkey AS k FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "k")
    only = cust.subtract(supp).select(F.lit("cust_only").alias("tag"), "k")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Sort + Top-K (Sort: thrill/api/sort.hpp:64; Top-K absent in reference,
# SURVEY §2.6 note)
# ---------------------------------------------------------------------------
@query(
    "sort_top_orders",
    """
    SELECT rank, o_orderkey, o_totalprice FROM (
      SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank,
             o_orderkey, o_totalprice
      FROM orders)
    WHERE rank <= 20
    """,
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # TakeOrderedAndProject: limit pushes into the sort, no global shuffle
    top = orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(20)
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return top.select(F.row_number().over(w).alias("rank"), "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# ZipWithIndex (thrill/api/zip_with_index.hpp:30-38) — scalable two-phase
# ---------------------------------------------------------------------------
@query(
    "zip_with_index_orders",
    """
    SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS _idx, o_orderkey
    FROM orders
    """,
)
def q_zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", spread=True).select("o_orderkey")
    return O.with_index(orders, ["o_orderkey"]).select("_idx", "o_orderkey")


# ---------------------------------------------------------------------------
# Zip cut (thrill/api/zip.hpp CutTag): positional zip of two tables
# ---------------------------------------------------------------------------
@query(
    "zip_cut_customers_parts",
    """
    WITH c AS (SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS _idx, c_custkey FROM customer),
         p AS (SELECT ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS _idx, p_partkey FROM part)
    SELECT c._idx AS _idx, c_custkey, p_partkey FROM c JOIN p ON c._idx = p._idx
    """,
)
def q_zip_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    return O.zip_dfs([cust, part], [["c_custkey"], ["p_partkey"]], how="cut").select(
        "_idx", "c_custkey", "p_partkey"
    )


# ---------------------------------------------------------------------------
# PrefixSum (thrill/api/prefix_sum.hpp:28) — two-phase running sum
# ---------------------------------------------------------------------------
@query(
    "prefix_sum_totalprice",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", _dec("o_totalprice").alias("p")
    )
    out = O.prefix_sum(orders, ["o_orderkey"], "p", name="running_total")
    return out.select("o_orderkey", _dbl(F.col("running_total")).alias("running_total"))


# ---------------------------------------------------------------------------
# Sliding window (thrill/api/window.hpp:142 OverlapWindowNode)
# ---------------------------------------------------------------------------
@query(
    "window_sliding_sum",
    """
    SELECT o_orderkey, win_sum, win_cnt FROM (
      SELECT o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (ORDER BY o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS win_sum,
             COUNT(*) OVER (ORDER BY o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS win_cnt,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders)
    WHERE rn >= 7
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _dec("o_totalprice").alias("p")
    )
    out = O.sliding_window(
        orders,
        ["o_orderkey"],
        size=7,
        aggs={"win_sum": F.sum("p"), "win_cnt": F.count("*")},
    )
    return out.select("o_orderkey", _dbl(F.col("win_sum")).alias("win_sum"), "win_cnt")


# ---------------------------------------------------------------------------
# FlatWindow with a PARTIAL window function (thrill/api/window.hpp:
# 215-236): windows are START-indexed — the frame is the k items
# beginning at each row — and the trailing <k suffix windows are
# emitted too (Thrill's partial_window_function_, drained by the last
# worker). win_cnt IS each window's actual size, so the partial tail
# is visible in the output (7,7,...,7,6,5,4,3,2,1).
# ---------------------------------------------------------------------------
@query(
    "window_sliding_partial_tail",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS DOUBLE)
               AS win_sum,
           COUNT(*) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
               AS win_cnt
    FROM orders
    """,
)
def q_window_sliding_partial_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _dec("o_totalprice").alias("p")
    )
    out = O.flat_window_partial(
        orders,
        ["o_orderkey"],
        size=7,
        aggs={"win_sum": F.sum("p")},
        size_col="win_cnt",
    )
    return out.select(
        "o_orderkey", _dbl(F.col("win_sum")).alias("win_sum"), "win_cnt"
    )


# ---------------------------------------------------------------------------
# Disjoint (tumbling) window (thrill/api/window.hpp:389 DisjointWindowNode)
# ---------------------------------------------------------------------------
@query(
    "window_disjoint_blocks",
    """
    SELECT window_id, COUNT(*) AS n,
           CAST(SUM(p) AS DOUBLE) AS block_total
    FROM (
      SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 100 AS window_id,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders)
    GROUP BY window_id
    """,
)
def q_window_disjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", _dec("o_totalprice").alias("p")
    )
    out = O.disjoint_window(
        orders,
        ["o_orderkey"],
        size=100,
        aggs={"n": F.count("*"), "block_total": F.sum("p")},
    )
    return out.select("window_id", "n", _dbl(F.col("block_total")).alias("block_total"))


# ---------------------------------------------------------------------------
# ReduceToIndex (thrill/api/dia.hpp:1306-1311): dense array w/ neutral holes
# ---------------------------------------------------------------------------
@query(
    "reduce_to_index_nation",
    """
    SELECT CAST(r.range AS BIGINT) AS n_nationkey,
           CAST(COALESCE(s.total, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           COALESCE(s.n, 0) AS n_customers
    FROM range(25) r
    LEFT JOIN (
      SELECT c_nationkey, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total, COUNT(*) AS n
      FROM customer GROUP BY c_nationkey
    ) s ON r.range = s.c_nationkey
    """,
)
def q_reduce_to_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    out = O.reduce_to_index(
        cust.select(F.col("c_nationkey").alias("n_nationkey"), _dec("c_acctbal").alias("b")),
        index_col="n_nationkey",
        size=25,
        aggs={"total_acctbal": F.sum("b"), "n_customers": F.count("*")},
        neutral={"total_acctbal": 0.0, "n_customers": 0},
    )
    return out.select(
        "n_nationkey",
        _dbl(F.col("total_acctbal").cast("decimal(28,2)")).alias("total_acctbal"),
        F.col("n_customers").cast("long").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Merge of sorted inputs (thrill/api/merge.hpp:44-76)
# ---------------------------------------------------------------------------
@query(
    "merge_sorted_halves",
    """
    SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS _idx, o_orderkey, o_totalprice
    FROM orders
    """,
)
def q_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    evens = orders.filter(F.col("o_orderkey") % 2 == 0).orderBy("o_orderkey")
    odds = orders.filter(F.col("o_orderkey") % 2 == 1).orderBy("o_orderkey")
    merged = O.merge_sorted([evens, odds], ["o_orderkey"])
    return O.with_index(merged, ["o_orderkey"]).select("_idx", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Systematic sample (deterministic stand-in for Sample(k),
# thrill/api/sample.hpp:33-50)
# ---------------------------------------------------------------------------
@query(
    "sample_systematic",
    """
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
      FROM orders)
    WHERE rn % 50 = 0
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return B.systematic_sample(orders, ["o_orderkey"], every_k=50)


# ---------------------------------------------------------------------------
# BernoulliSample (thrill/api/bernoulli_sample.hpp:27) — randomized, so
# individual rows have no oracle; the CHECKED value is the sampled
# fraction against a 5-sigma binomial band (the oracle asserts the band
# holds: a broken sampler flips in_band to false and hash-mismatches).
# ---------------------------------------------------------------------------
@query(
    "bernoulli_sample",
    "SELECT COUNT(*) AS total_rows, TRUE AS in_band FROM orders",
)
def q_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = 0.1
    sampled = B.bernoulli_sample(orders, p, seed=42)
    n_s = sampled.agg(F.count("*").alias("n_s"))
    return (
        orders.agg(F.count("*").alias("total_rows"))
        .crossJoin(n_s)
        .select(
            "total_rows",
            (
                F.abs(F.col("n_s") / F.col("total_rows") - F.lit(p))
                <= F.lit(5.0) * F.sqrt(F.lit(p * (1 - p)) / F.col("total_rows"))
            ).alias("in_band"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog (thrill/api/hyperloglog.hpp:27) — approximate; different
# estimator than DuckDB, so the estimate itself has no oracle. The
# CHECKED value: the HLL++ estimate must sit within 5*rsd of the exact
# distinct count (computed in the same Spark plan); the oracle asserts
# the band and the exact count.
# ---------------------------------------------------------------------------
@query(
    "hyperloglog_distinct",
    "SELECT COUNT(DISTINCT l_partkey) AS exact_distinct, TRUE AS hll_ok FROM lineitem",
)
def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.01
    return li.agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_distinct"),
        F.approx_count_distinct("l_partkey", rsd).alias("_est"),
    ).select(
        "exact_distinct",
        (
            F.abs(F.col("_est") - F.col("exact_distinct"))
            <= F.lit(5.0) * F.lit(rsd) * F.col("exact_distinct")
        ).alias("hll_ok"),
    )


# ---------------------------------------------------------------------------
# Scalar actions Sum/Min/Max/Size as one aggregate row
# (thrill/api/sum.hpp, min.hpp:67, max.hpp:67, size.hpp:28)
# ---------------------------------------------------------------------------
@query(
    "actions_scalar",
    """
    SELECT COUNT(*) AS size,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def q_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("size"),
        _dbl(F.sum(_dec("l_quantity"))).alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# Generate source (thrill/api/generate.hpp:37): DIA from f(i)
# ---------------------------------------------------------------------------
@query(
    "generate_range",
    """
    SELECT CAST(range AS BIGINT) AS i,
           CAST(range AS BIGINT) * CAST(range AS BIGINT) AS sq,
           CAST(range AS BIGINT) % 7 AS bucket
    FROM range(10000)
    """,
)
def q_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(10000).select(
        F.col("id").alias("i"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 7).alias("bucket"),
    )


# Register extension batches (import side effects populate QUERIES/ORACLES).
from thrill_spark.plans import queries_ordered  # noqa: E402,F401
from thrill_spark.plans import queries_llm  # noqa: E402,F401
from thrill_spark.plans import queries_algo  # noqa: E402,F401
from thrill_spark.plans import queries_extra  # noqa: E402,F401
from thrill_spark.plans import queries_tpch  # noqa: E402,F401
from thrill_spark.plans import queries_tpch_full  # noqa: E402,F401
from thrill_spark.plans import queries_functions  # noqa: E402,F401
from thrill_spark.plans import queries_corpus  # noqa: E402,F401
from thrill_spark.plans import queries_pipeline  # noqa: E402,F401
from thrill_spark.plans import queries_mining  # noqa: E402,F401
from thrill_spark.plans import queries_curation  # noqa: E402,F401
from thrill_spark.plans import queries_analytics  # noqa: E402,F401
