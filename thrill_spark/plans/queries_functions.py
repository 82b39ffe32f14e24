"""Queries batch 7: the scalar/aggregate function corpus (SURVEY
§2.12). Thrill ships no function library — every transform is a user
C++ lambda; a replacement engine must provide the function surface
users would otherwise hand-write. Each family is exercised as an
oracle-matched query: string ops, date/time ops, array ops, ranking
windows, exact percentiles.

All expressions are JVM built-ins inside whole-stage codegen; the
oracle check doubles as a cross-engine semantics audit (regex dialect,
interpolation arithmetic, null handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table
from thrill_spark.plans.queries import _dbl, _dec, query


@query(
    "fn_string_ops",
    r"""
    SELECT c_custkey,
           upper(c_name) AS uname,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS prefix8,
           replace(c_name, '#', '-') AS dashed,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           concat(c_mktsegment, ':', CAST(c_custkey % 10 AS VARCHAR)) AS tag,
           CAST(contains(c_name, '1') AS BOOLEAN) AS has_one
    FROM customer
    """,
)
def q_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.concat(
            F.col("c_mktsegment"), F.lit(":"), (F.col("c_custkey") % 10).cast("string")
        ).alias("tag"),
        F.col("c_name").contains("1").alias("has_one"),
    )


@query(
    "fn_datetime_ops",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k,
           o_orderdate + INTERVAL 90 DAY AS due
    FROM orders
    """,
)
def q_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due"),
    )


@query(
    "fn_array_ops",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_x,
           CAST(list_max(embedding) AS DOUBLE) AS mx,
           CAST(list_min(embedding) AS DOUBLE) AS mn,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0) AS head3_scaled
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_x"),
        F.array_max("embedding").cast("double").alias("mx"),
        F.array_min("embedding").cast("double").alias("mn"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        # round() is deliberately absent: Spark rounds HALF_UP, DuckDB
        # HALF_EVEN — a true cross-engine semantics divergence.
        F.transform(
            F.slice("embedding", 1, 3), lambda x: x.cast("double") * 2.0
        ).alias("head3_scaled"),
    )


@query(
    "fn_ranking_windows",
    """
    SELECT s_suppkey, s_nationkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(LAG(s_suppkey, 1) OVER w AS BIGINT) AS prev_key,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2)))
                OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_ranking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("s_suppkey", 1).over(w).cast("long").alias("prev_key"),
        F.sum(_dec("s_acctbal"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_bal"),
    )


@query(
    "fn_percentiles_exact",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.95) AS p95,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (the reference's
    percentiles example, examples/percentiles/percentiles.cpp:60-75,
    generalized beyond median). Spark `percentile` and DuckDB
    `quantile_cont` share the interpolation formula — verified
    bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
