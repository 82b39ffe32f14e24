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
           CAST(embedding[1] AS DOUBLE) * 2.0 AS h1_scaled,
           CAST(embedding[2] AS DOUBLE) * 2.0 AS h2_scaled,
           CAST(embedding[3] AS DOUBLE) * 2.0 AS h3_scaled
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
        # HALF_EVEN — a true cross-engine semantics divergence. Scalar
        # doubles (not an array) so the driver canonicalizer can sort.
        (F.element_at("embedding", 1).cast("double") * 2.0).alias("h1_scaled"),
        (F.element_at("embedding", 2).cast("double") * 2.0).alias("h2_scaled"),
        (F.element_at("embedding", 3).cast("double") * 2.0).alias("h3_scaled"),
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
    "fn_conditional_null_ops",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS band,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           CAST(least(c_acctbal, 1000.0) AS DOUBLE) AS capped,
           CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS floored,
           CAST(if(c_custkey % 2 = 0, c_custkey, -c_custkey) AS BIGINT) AS signed_key,
           CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_null
    FROM customer
    """,
)
def q_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).cast("double").alias("capped"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).cast("double").alias("floored"),
        F.when(F.col("c_custkey") % 2 == 0, F.col("c_custkey"))
        .otherwise(-F.col("c_custkey"))
        .cast("long")
        .alias("signed_key"),
        F.isnull("c_acctbal").alias("bal_null"),
    )


@query(
    "fn_regex_ops",
    r"""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           CAST(regexp_matches(c_name, '0{2,}') AS BOOLEAN) AS has_00,
           split_part(c_name, '#', 2) AS after_hash,
           len(string_split_regex(c_name, '[#0]')) AS n_pieces
    FROM customer
    """,
)
def q_regex_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-dialect audit (Java regex vs DuckDB RE2) on the shared
    subset: char classes, bounded repetition, global replace, split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").rlike("0{2,}").alias("has_00"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.size(F.split(F.col("c_name"), r"[#0]")).alias("n_pieces"),
    )


@query(
    "fn_bitwise_hash_ops",
    """
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(o_orderkey << 2 AS BIGINT) AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
           md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
           sha256(CAST(o_orderkey AS VARCHAR)) AS key_sha,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded
    FROM orders
    """,
)
def q_bitwise_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
        F.md5(k.cast("string")).alias("key_md5"),
        F.sha2(k.cast("string"), 256).alias("key_sha"),
        F.lpad(k.cast("string"), 12, "0").alias("padded"),
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


@query(
    "fn_math_ops",
    """
    SELECT o_orderkey,
           CAST(abs(o_totalprice - 100000.0) AS DOUBLE) AS dist,
           CAST(ceil(o_totalprice) AS DOUBLE) AS up,
           CAST(floor(o_totalprice) AS DOUBLE) AS down,
           CAST(sqrt(o_totalprice) AS DOUBLE) AS root,
           CAST(power(o_orderkey % 10, 2) AS DOUBLE) AS sq,
           CAST(o_orderkey % 7 AS BIGINT) AS m7,
           CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn,
           CAST(greatest(o_totalprice, 100000.0) AS DOUBLE) AS hi_clamp,
           CAST(least(o_totalprice, 100000.0) AS DOUBLE) AS lo_clamp
    FROM orders
    """,
)
def q_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family audit, restricted to the IEEE-exact subset (abs /
    ceil / floor / sqrt / integer power / mod / sign / greatest /
    least). exp/ln/trig are excluded on purpose: correctly-rounded
    results are not mandated by IEEE 754, so Java vs C libm can differ
    in the last ulp and a hash-exact oracle would flake."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000.0).alias("dist"),
        F.ceil(p).cast("double").alias("up"),
        F.floor(p).cast("double").alias("down"),
        F.sqrt(p).alias("root"),
        F.pow(F.col("o_orderkey") % 10, F.lit(2)).alias("sq"),
        (F.col("o_orderkey") % 7).cast("long").alias("m7"),
        F.signum(p - 150000.0).alias("sgn"),
        F.greatest(p, F.lit(100000.0)).alias("hi_clamp"),
        F.least(p, F.lit(100000.0)).alias("lo_clamp"),
    )


@query(
    "fn_struct_map_ops",
    """
    SELECT c_custkey,
           struct_extract(struct_pack(seg := c_mktsegment, bal := c_acctbal), 'seg')
             AS seg_out,
           CAST(struct_extract(struct_pack(seg := c_mktsegment, bal := c_acctbal), 'bal')
             AS DOUBLE) AS bal_out,
           CAST(element_at(map {'n': c_nationkey}, 'n')[1] AS INT) AS nat_out,
           CAST(map_extract(map {'a': c_custkey, 'b': c_custkey * 2}, 'b')[1] AS BIGINT)
             AS b_val
    FROM customer
    """,
)
def q_struct_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map constructor + accessor audit. Emits extracted SCALAR
    fields, not the nested values themselves: cross-engine nested-type
    normalization (Row vs dict) is representation, not semantics, and
    the accessors are what user code exercises."""
    c = load_table(spark, sf_dir, "customer")
    st = F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal"))
    m1 = F.create_map(F.lit("n"), F.col("c_nationkey"))
    m2 = F.create_map(
        F.lit("a"), F.col("c_custkey"), F.lit("b"), F.col("c_custkey") * 2
    )
    return c.select(
        "c_custkey",
        st.getField("seg").alias("seg_out"),
        st.getField("bal").cast("double").alias("bal_out"),
        F.element_at(m1, F.lit("n")).cast("int").alias("nat_out"),
        F.element_at(m2, F.lit("b")).cast("long").alias("b_val"),
    )


@query(
    "fn_collect_aggs",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000.0) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_pos,
           bool_or(o_orderstatus = 'F') AS any_f,
           CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS cheapest_key,
           CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS dearest_key,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           array_to_string(list_sort(list(o_orderkey ORDER BY o_orderkey))[1:5], ',') AS first5_keys
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_collect_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection/conditional aggregate audit: filtered count, bool
    aggs, arg_min/arg_max, and collect_list/collect_set made
    deterministic via array_sort (collection order is engine-defined;
    sorted content is the portable semantics)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.min_by("o_orderkey", "o_totalprice").cast("long").alias("cheapest_key"),
        F.max_by("o_orderkey", "o_totalprice").cast("long").alias("dearest_key"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.slice(F.array_sort(F.collect_list("o_orderkey")), 1, 5).cast(
                "array<string>"
            ),
            ",",
        ).alias("first5_keys"),
    )


@query(
    "fn_window_frames",
    """
    SELECT o_orderkey, o_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(NTH_VALUE(o_orderkey, 2) OVER
                (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS second_key,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_key,
           CAST(LAST_VALUE(o_orderkey) OVER
                (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS last_key,
           CAST(COUNT(*) OVER
                (PARTITION BY o_custkey ORDER BY o_orderkey
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_near,
           CAST(SUM(o_orderkey) OVER
                (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
             AS BIGINT) AS sum_win
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME audit: ntile, nth/first/last_value over explicit
    full frames, an integer RANGE frame, and a bounded ROWS frame —
    the frame dialects are a classic cross-engine drift source, so
    every frame is explicit on both sides."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.nth_value("o_orderkey", 2).over(wfull).cast("long").alias("second_key"),
        F.first("o_orderkey").over(w).cast("long").alias("first_key"),
        F.last("o_orderkey").over(wfull).cast("long").alias("last_key"),
        F.count(F.lit(1)).over(w.rangeBetween(-1000, 0)).alias("n_near"),
        F.sum("o_orderkey").over(w.rowsBetween(-2, 1)).alias("sum_win"),
    )


@query(
    "fn_higher_order_array",
    """
    WITH base AS (
      SELECT c_custkey,
             [c_custkey, c_custkey*2, c_custkey*3, c_custkey%97] AS l1,
             [c_custkey%5, c_custkey%11, c_custkey%17, c_custkey%23] AS l2
      FROM customer)
    SELECT c_custkey,
           array_to_string(list_filter(l1, x -> x % 2 = 0), ',') AS evens,
           len(list_filter(l1, x -> x > 1000)) > 0 AS has_big,
           len(list_filter(l1, x -> x < 0)) = 0 AS all_pos,
           CAST(list_reduce(l1, (a, b) -> a + b) AS BIGINT) AS fold_sum,
           array_to_string(list_transform(list_zip(l1, l2), p -> p[1] + p[2]), ',') AS zsum
    FROM base
    """,
)
def q_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function audit: filter / exists / forall /
    aggregate(fold) / zip_with, integer-exact on both engines (DuckDB
    expresses exists/forall through list_filter lengths; Spark
    aggregate's 0 seed is identity for integer +, matching
    list_reduce's first-element seed)."""
    c = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    base = c.select(
        "c_custkey",
        F.array(ck, ck * 2, ck * 3, ck % 97).alias("l1"),
        F.array(ck % 5, ck % 11, ck % 17, ck % 23).alias("l2"),
    )
    return base.select(
        "c_custkey",
        F.array_join(
            F.filter("l1", lambda x: x % 2 == 0).cast("array<string>"), ","
        ).alias("evens"),
        F.exists("l1", lambda x: x > 1000).alias("has_big"),
        F.forall("l1", lambda x: x >= 0).alias("all_pos"),
        F.aggregate("l1", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fold_sum"
        ),
        F.array_join(
            F.zip_with("l1", "l2", lambda x, y: x + y).cast("array<string>"), ","
        ).alias("zsum"),
    )


@query(
    "fn_stats_exact",
    """
    WITH b AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice) AS BIGINT) % 100000 AS x,
             o_orderkey % 65536 AS y
      FROM orders),
    m AS (
      SELECT o_orderpriority,
             CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(y * y) AS BIGINT) AS DOUBLE) AS syy,
             CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy
      FROM b GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n,
           sx / n AS mean_x,
           (n * sxx - sx * sx) / (n * (n - 1)) AS var_x,
           sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_x,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
    FROM m
    """,
)
def q_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation via EXACT integer moments:
    engine-native var/corr aggregates stream FP partials in
    partition-dependent order (never bit-reproducible). Here every
    moment is summed exactly in BIGINT, each moment is mod-bounded so
    it converts to DOUBLE exactly (< 2^53 — large-integer-to-double
    conversion is the one step engines round differently), and the
    statistics derive from one identical final FP expression — fully
    deterministic on both engines."""
    o = load_table(spark, sf_dir, "orders")
    x = F.round(F.col("o_totalprice")).cast("long") % 100000
    y = F.col("o_orderkey") % 65536
    b = o.select("o_orderpriority", x.alias("x"), y.alias("y"))
    dbl = lambda c: c.cast("long").cast("double")  # noqa: E731
    m = b.groupBy("o_orderpriority").agg(
        dbl(F.count(F.lit(1))).alias("n"),
        dbl(F.sum("x")).alias("sx"),
        dbl(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        dbl(F.sum("y")).alias("sy"),
        dbl(F.sum(F.col("y") * F.col("y"))).alias("syy"),
        dbl(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "o_orderpriority",
        n.cast("long").alias("n"),
        (sx / n).alias("mean_x"),
        ((n * sxx - sx * sx) / (n * (n - 1))).alias("var_x"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - 1))).alias("stddev_x"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_xy"),
    )


@query(
    "fn_string_distance",
    """
    SELECT c_custkey,
           CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev_name_seg,
           CAST(levenshtein(left(c_name, 8), left(c_mktsegment, 8)) AS BIGINT) AS lev_prefix8,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_folded,
           repeat(left(c_mktsegment, 2), 3) AS seg_rep,
           reverse(c_name) AS name_rev,
           CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ascii,
           CAST(strpos(c_name, '1') AS BIGINT) AS pos_one,
           right(c_name, 4) AS name_tail
    FROM customer
    """,
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String distance / manipulation audit: levenshtein (the fuzzy-
    match primitive record linkage runs at scale), translate, repeat,
    reverse, ascii, strpos/instr, left/right — cross-engine dialect
    pinned (Spark instr == DuckDB strpos, 1-based, 0 when absent)."""
    c = load_table(spark, sf_dir, "customer")
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.levenshtein(name, seg).cast("long").alias("lev_name_seg"),
        F.levenshtein(F.substring(name, 1, 8), F.substring(seg, 1, 8))
        .cast("long")
        .alias("lev_prefix8"),
        F.translate(seg, "AEIOU", "aeiou").alias("seg_folded"),
        F.repeat(F.substring(seg, 1, 2), 3).alias("seg_rep"),
        F.reverse(name).alias("name_rev"),
        F.ascii(seg).cast("long").alias("seg_ascii"),
        F.instr(name, "1").cast("long").alias("pos_one"),
        F.substring(name, -4, 4).alias("name_tail"),
    )


@query(
    "fn_generators",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             CASE WHEN o_orderkey % 3 = 0 THEN []
                  ELSE [o_orderkey % 7, o_orderkey % 11] END AS arr
      FROM orders WHERE o_orderkey <= 2000),
    exploded AS (
      -- posexplode_outer: empty arrays keep the row with NULLs
      SELECT o_orderkey, o_custkey,
             CAST(u.pos - 1 AS INT) AS pos, u.v AS val
      FROM base LEFT JOIN LATERAL
        (SELECT generate_subscripts(arr, 1) AS pos, unnest(arr) AS v) u ON TRUE),
    unpivoted AS (
      -- stack/unpivot: two label columns become (field, value) rows
      SELECT o_orderkey, 'status' AS field, o_orderstatus AS fval FROM base
      UNION ALL
      SELECT o_orderkey, 'priority', o_orderpriority FROM base)
    SELECT e.o_orderkey, e.o_custkey, e.pos, CAST(e.val AS BIGINT) AS val,
           u.field, u.fval
    FROM exploded e JOIN unpivoted u USING (o_orderkey)
    """,
)
def q_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/table-function audit: posexplode_outer (row-preserving
    explode — the LATERAL VIEW OUTER surface) and stack (unpivot);
    the join shape exercises generator output feeding a join."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>"))
        .otherwise(F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 11))
        .alias("arr"),
    )
    exploded = base.select(
        "o_orderkey",
        "o_custkey",
        F.posexplode_outer("arr").alias("pos", "val"),
    )
    unpivoted = base.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'status', o_orderstatus, 'priority', o_orderpriority) "
            "as (field, fval)"
        ),
    )
    return exploded.join(unpivoted, "o_orderkey").select(
        "o_orderkey", "o_custkey", "pos", F.col("val").cast("long").alias("val"),
        "field", "fval",
    )


@query(
    "fn_variant_ops",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_extract(props, '$.missing') IS NULL AS missing_is_null,
           CAST(json_array_length(json_extract(props, '$')) IS NOT NULL
                AND json_type(json_extract(props, '$')) = 'ARRAY' AS BOOLEAN)
             AS is_array
    FROM events WHERE event_id % 7 = 0
    """,
)
def q_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType audit (Spark 4's semi-structured type): parse_json
    into a VARIANT column once, then typed variant_get extraction —
    the open-schema path that replaces per-field get_json_object
    re-parsing. The variant column itself never reaches the output
    (complex types are serialized at the driver boundary); the
    extracted scalars are the checked semantics."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    v = ev.select("event_id", F.parse_json("props").alias("_v"))
    return v.select(
        "event_id",
        F.variant_get("_v", "$.k", "long").alias("k_val"),
        (F.variant_get("_v", "$.k", "long") % 10).alias("k_mod"),
        F.variant_get("_v", "$.missing", "string").isNull().alias("missing_is_null"),
        (F.schema_of_variant(F.col("_v")).startswith("ARRAY")).alias("is_array"),
    )
