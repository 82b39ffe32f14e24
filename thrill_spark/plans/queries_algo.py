"""Algorithm + I/O queries, batch 4: the reference's example workloads
(PageRank / k-means / triangles / selection) and source/sink
round-trips, as driver-checkable queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table, scratch_dir
from thrill_spark.plans import algorithms as A
from thrill_spark.plans.queries import query
from thrill_spark.sources import io as IO


def _edges(spark: SparkSession, sf_dir: str, mod: int = 200) -> DataFrame:
    """Deterministic graph derived from lineitem: part/supplier keys
    folded into one node space (mirrors the reference's synthetic
    zipf graphs, examples/page_rank/zipf_graph_gen.hpp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_partkey") % mod).alias("a"), (F.col("l_suppkey") % mod).alias("b")
    )


@query(
    "triangle_count",
    """
    WITH e AS (
      SELECT DISTINCT least(l_partkey % 200, l_suppkey % 200) AS u,
                      greatest(l_partkey % 200, l_suppkey % 200) AS v
      FROM lineitem
      WHERE least(l_partkey % 200, l_suppkey % 200)
            < greatest(l_partkey % 200, l_suppkey % 200))
    SELECT COUNT(*) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = A.triangle_count(_edges(spark, sf_dir))
    return spark.createDataFrame([(n,)], "n_triangles long")


# PageRank ranks are order-dependent FP sums, so the values themselves
# have no exact oracle. The CHECKED properties (bernoulli_sample
# pattern): node count (exact), rank mass conservation, positivity,
# and positive rank/in-degree correlation — a broken iteration flips a
# boolean and hash-mismatches.
@query(
    "pagerank",
    """
    WITH e AS (SELECT l_partkey % 200 AS src, l_suppkey % 200 AS dst FROM lineitem),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)
    SELECT CAST(count(*) AS BIGINT) AS n_nodes, TRUE AS mass_ok,
           TRUE AS positive_ok, TRUE AS corr_ok
    FROM nodes
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ranks = A.pagerank(edges, iterations=3)
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("indeg"))
    joined = ranks.join(indeg, on="node", how="left").fillna({"indeg": 0})
    return joined.agg(
        F.count("*").alias("n_nodes"),
        (F.abs(F.sum("rank") - F.lit(1.0)) < F.lit(1e-6)).alias("mass_ok"),
        (F.min("rank") > F.lit(0.0)).alias("positive_ok"),
        (F.corr("rank", "indeg") > F.lit(0.0)).alias("corr_ok"),
    )


# k-means assignments depend on FP distance ties, so per-point labels
# are not oracle-able; the CHECKED properties: point count (exact),
# cluster ids within [0, k), and the Lloyd-step invariant that inertia
# (sum of squared distances to assigned centroids) never increases.
@query(
    "kmeans_clusters",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_points, TRUE AS clusters_ok,
           TRUE AS inertia_ok
    FROM embeddings
    """,
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, inertia = A.kmeans(emb, k=4, iterations=3, return_history=True)
    inertia_ok = all(
        inertia[i + 1] <= inertia[i] * (1 + 1e-9) for i in range(len(inertia) - 1)
    )
    return assigned.agg(
        F.count("*").alias("n_points"),
        ((F.min("cluster") >= 0) & (F.max("cluster") < 4)).alias("clusters_ok"),
    ).withColumn("inertia_ok", F.lit(inertia_ok))


# Logistic regression / SGD (reference example listing, SURVEY §2.13)
# on planted separable labels: y = [e1 + e2 > 0]. Weights are FP-
# iterative; the CHECKED properties: point count (exact), training
# loss decreased, and the learned separator recovers the plant
# (accuracy >= 0.85; measured 0.92-0.96 across sf0.001/0.01/0.1 —
# full convergence to the separating w=(1,1,0,...) is asymptotic).
@query(
    "logreg_sgd_planted",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_points, TRUE AS loss_decreased_ok,
           TRUE AS acc_ok
    FROM embeddings
    """,
)
def q_logreg_sgd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("embedding").alias("x"),
        (
            (F.element_at("embedding", 1) + F.element_at("embedding", 2)) > 0
        ).cast("int").alias("y"),
    )
    w, losses = A.logistic_regression_sgd(
        pts, dim=64, iterations=12, lr=20.0, return_history=True
    )
    warr = F.array(*[F.lit(x) for x in w])
    margin = F.aggregate(
        F.zip_with(F.col("x"), warr, lambda x, wi: x.cast("double") * wi),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    correct = ((margin > 0).cast("int") == F.col("y")).cast("double")
    return (
        pts.agg(
            F.count("*").alias("n_points"),
            (F.avg(correct) >= F.lit(0.85)).alias("acc_ok"),
        )
        .withColumn("loss_decreased_ok", F.lit(bool(losses[-1] < losses[0])))
        .select("n_points", "loss_decreased_ok", "acc_ok")
    )


@query(
    "kth_statistic",
    """
    SELECT o_totalprice AS kth_value FROM orders
    ORDER BY o_totalprice LIMIT 1 OFFSET 99
    """,
)
def q_kth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = A.kth_statistic(orders, "o_totalprice", 99)
    return spark.createDataFrame([(float(v),)], "kth_value double")


# ---------------------------------------------------------------------------
# Source/sink round-trips (ReadLines/WriteLines, ReadBinary/WriteBinary)
# ---------------------------------------------------------------------------
@query(
    "io_lines_roundtrip",
    "SELECT count(*) AS n_lines FROM documents",
)  # fixture text has no embedded newlines, so line count == row count
def q_io_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "lines")
    IO.write_lines(docs, out)
    back = IO.read_lines(spark, out)
    return back.agg(F.count("*").alias("n_lines"))


@query(
    "io_binary_roundtrip",
    """SELECT count(*) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders""",
)
def q_io_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = scratch_dir(spark, "binary")
    IO.write_binary(orders, out)
    back = IO.read_binary(spark, out)
    return back.agg(
        F.count("*").alias("n_rows"), F.sum(F.col("o_orderkey")).alias("key_sum")
    )


# ---------------------------------------------------------------------------
# BFS on a deterministic generated graph (i -> 2i+1 mod N, i -> 3i+7
# mod N). Distances are integers -> exact recursive-CTE oracle.
# ---------------------------------------------------------------------------
_BFS_N = 500


@query(
    "bfs_distances",
    f"""
    WITH RECURSIVE edges AS (
      SELECT i AS src, (2*i+1) % {_BFS_N} AS dst FROM range({_BFS_N}) t(i)
      UNION ALL
      SELECT i, (3*i+7) % {_BFS_N} FROM range({_BFS_N}) t(i)
    ),
    walk(node, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION
      SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 25
    )
    SELECT node, CAST(MIN(d) AS INT) AS d FROM walk GROUP BY node
    """,
)
def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = spark.range(_BFS_N).select(F.col("id").alias("src"))
    edges = ids.select("src", ((F.col("src") * 2 + 1) % _BFS_N).alias("dst")).unionByName(
        ids.select("src", ((F.col("src") * 3 + 7) % _BFS_N).alias("dst"))
    )
    return A.bfs(edges, source=0)


# ---------------------------------------------------------------------------
# Suffix array of document 0 by distributed prefix doubling. Suffixes
# of one string are pairwise distinct -> exact ORDER BY oracle.
# ---------------------------------------------------------------------------
@query(
    "suffix_array_doc0",
    """
    SELECT pos,
           CAST(ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS BIGINT) AS rank
    FROM (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
          FROM documents WHERE doc_id = 0)
    """,
)
def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0)
    chars = A.chunked_chars(doc, assume_single_row=True)
    # n from the 1-row text length — counting the exploded char table
    # would re-run the full explode as a throwaway pass (r11 lesson)
    n = int(doc.agg(F.sum(F.length("text")).alias("_n")).first()["_n"] or 0)
    return A.suffix_array(chars, n)


@query(
    "io_csv_roundtrip",
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
              MAX(o_orderdate) AS max_date
       FROM orders GROUP BY o_orderstatus""",
)
def q_io_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip must preserve longs, doubles (shortest-repr),
    timestamps, and strings exactly."""
    orders = load_table(spark, sf_dir, "orders")
    out = scratch_dir(spark, "csv")
    IO.write_csv(orders, out)
    back = IO.read_csv(spark, out, orders.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("price_sum"),
        F.max("o_orderdate").alias("max_date"),
    )


@query(
    "io_orc_roundtrip",
    """SELECT l_returnflag, COUNT(*) AS n_rows,
              CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS price_sum
       FROM lineitem GROUP BY l_returnflag""",
)
def q_io_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (Spark-native second columnar format): write the
    fact table, read it back, aggregate — values must match the
    parquet-sourced oracle exactly."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    out = scratch_dir(spark, "orc")
    IO.write_orc(li, out)
    back = IO.read_orc(spark, out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_orderkey").alias("key_sum"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("price_sum"),
    )


@query(
    "io_json_roundtrip",
    """SELECT event_type, COUNT(*) AS n_rows,
              CAST(SUM(event_id) AS BIGINT) AS id_sum,
              MIN(ts) AS min_ts, MAX(ts) AS max_ts
       FROM events GROUP BY event_type""",
)
def q_io_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    out = scratch_dir(spark, "json")
    IO.write_json(ev, out)
    back = IO.read_json(spark, out, ev.schema)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum("event_id").alias("id_sum"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "io_partitioned_pruned_scan",
    """SELECT l_linestatus, COUNT(*) AS n_rows,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus""",
)
def q_io_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem hive-partitioned by l_returnflag, read back with a
    partition filter: the scan lists only the matching directory
    (PartitionFilters — asserted in tests/test_sources.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = scratch_dir(spark, "part")
    IO.write_partitioned(li, out, ["l_returnflag"])
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


# Compressed-lines round-trip: WriteLines with a gzip codec, ReadLines
# auto-detects via the Hadoop codec factory (the reference's vfs
# gzip_filter, thrill/vfs/gzip_filter.hpp) — the VFS codec claim as an
# oracle-checked query instead of a unit test.
@query(
    "io_gz_lines_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_io_gz_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "gz_lines")
    (
        docs.select(F.col("line").cast("string").alias("value"))
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(out)
    )
    back = IO.read_lines(spark, out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    )


# bzip2-lines round-trip (thrill/vfs/bzip2_filter.hpp parity): Spark
# writes with the Hadoop Bzip2Codec and ReadLines auto-detects it the
# same way as gzip — and unlike gzip, bz2 is block-splittable, so a
# 100 TB bz2 corpus still scans in parallel.
@query(
    "io_bz2_lines_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_io_bz2_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "bz2_lines")
    (
        docs.select(F.col("line").cast("string").alias("value"))
        .write.mode("overwrite")
        .option("compression", "bzip2")
        .text(out)
    )
    back = IO.read_lines(spark, out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    )


# Oversized-bz2 AUTO-ROUTE roundtrip (VERDICT r13 #5): one giant bz2
# member next to small plain files makes ReadLines serve the whole
# read through Hadoop's splittable-bz2 scan (api._hadoop_split_lines)
# instead of the byte-range source — this query proves the route's
# DEFINED ORDER end-to-end as an oracle row, not just a unit test.
# Fixture: group A (doc_id % 8 == 0) as plain files named a-00000.. in
# doc_id-range order; group B (the other 7/8) as ONE b-giant.txt.bz2
# in doc_id order. Sorted-path file order + stream order per file =>
# the global line sequence is group A by doc_id, then group B by
# doc_id — which the oracle re-derives as ROW_NUMBER over
# ((doc_id % 8 <> 0), doc_id). The read runs under a temporarily
# small maxPartitionBytes and is materialized EAGERLY (the conf is
# read at action time, so a lazy return would escape it); the
# was_split column certifies the bz2 content really spanned >1 Hadoop
# split, i.e. the (file_idx, _blk, _seq) order key was rebuilt across
# real block boundaries.
@query(
    "io_bz2_autosplit_roundtrip",
    """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY (doc_id % 8 <> 0), doc_id) - 1
                AS BIGINT) AS seq,
           md5(text) AS h,
           TRUE AS was_split
    FROM documents
    """,
)
def q_io_bz2_autosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import shutil

    from thrill_spark.api import ORD, V, ThrillContext

    docs = load_table(spark, sf_dir, "documents")
    out = scratch_dir(spark, "bz2_autosplit")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # group A: several small plain files, part index order = doc_id
    # range order (repartitionByRange partition i -> part-0000i)
    stage_a = os.path.join(out, "_stage_a")
    (
        docs.filter(F.col("doc_id") % 8 == 0)
        .repartitionByRange(3, "doc_id")
        .sortWithinPartitions("doc_id")
        .select(F.col("text").cast("string").alias("value"))
        .write.mode("overwrite")
        .text(stage_a)
    )
    for i, f in enumerate(sorted(_glob.glob(os.path.join(stage_a, "part-*")))):
        os.replace(f, os.path.join(out, f"a-{i:05d}.txt"))
    shutil.rmtree(stage_a, ignore_errors=True)
    # group B: ONE giant bz2 in doc_id order. The single-partition
    # write is FIXTURE FABRICATION, not a data-path pattern: the
    # query exists to prove the read side copes with an adversarial
    # input (one huge bz2 member, as produced by external uploaders),
    # which by definition is a single stream.
    stage_b = os.path.join(out, "_stage_b")
    (
        docs.filter(F.col("doc_id") % 8 != 0)
        .repartitionByRange(1, "doc_id")
        .sortWithinPartitions("doc_id")
        .select(F.col("text").cast("string").alias("value"))
        .write.mode("overwrite")
        .option("compression", "bzip2")
        .text(stage_b)
    )
    (bigf,) = _glob.glob(os.path.join(stage_b, "part-*.bz2"))
    os.replace(bigf, os.path.join(out, "b-giant.txt.bz2"))
    shutil.rmtree(stage_b, ignore_errors=True)

    # n_splits pins the auto-route trigger arithmetic (avg split =
    # total/32) independent of the session's parallelism — at every SF
    # the giant bz2 is ~7/8 of the corpus, far above 4x that step.
    dia = ThrillContext(spark).ReadLines(out, n_splits=32)
    ordfields = dia.df.schema[ORD].dataType.fieldNames()
    if "_blk" not in ordfields:
        raise AssertionError(
            f"oversized-bz2 auto-route did not fire (order key {ordfields})"
        )
    outp = os.path.join(out, "res.parquet")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # 2 KiB splits force MULTI-SPLIT files at every SF (the plain
    # members are ~7 KiB even at sf0.001; Spark's bzip2 writer emits
    # 900 KiB-input blocks, so the bz2 member itself only multi-splits
    # at large SF — the Python-written level-1 bz2 in
    # tests/test_api.py covers that case with 3+ real blocks).
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2048))
    # One decompression pass for both actions below (the split-count
    # certification and the indexed write would otherwise each re-scan
    # and re-decompress the giant bz2 member).
    from thrill_spark.api import DIA

    cached = dia.df.persist()
    dia = DIA(cached)
    try:
        # bounded scalars: distinct (file, split) pairs vs file count —
        # strictly more pairs than files proves the rebuilt order
        # spanned real split boundaries inside at least one file
        n_files = len(_glob.glob(os.path.join(out, "a-*.txt"))) + 1
        npairs = (
            cached.agg(
                F.count_distinct(
                    F.col(f"{ORD}.file_idx"), F.col(f"{ORD}._blk")
                ).alias("n")
            ).first()["n"]
        )
        nblk = npairs - n_files + 1
        (
            dia.ZipWithIndex()
            .df.select(
                F.col(f"{V}.i").cast("long").alias("seq"),
                F.md5(F.col(f"{V}.v").cast("binary")).alias("h"),
            )
            .write.mode("overwrite")
            .parquet(outp)
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        cached.unpersist()
    return spark.read.parquet(outp).select(
        "seq", "h", F.lit(bool(nblk > 1)).alias("was_split")
    )


# xz parity — the third codec the reference's vfs recognizes
# (vfs/file_io.cpp:48-50; it pipes streams through the external xz
# binary, file_io.cpp:197+). Hadoop ships no XZ codec, so the write
# goes through the thrill_lines Python DataSource writer (per-part
# lzma streams, two-phase commit) and the read through read_lines'
# per-file lzma pass. Parallelism is per-file on both sides (xz
# without a block index is not splittable — size-target the parts).
@query(
    "io_xz_lines_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_io_xz_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from thrill_spark.sources import linesource

    linesource.register(spark)
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "xz_lines")
    shutil.rmtree(out, ignore_errors=True)
    (
        docs.write.format("thrill_lines")
        .option("path", out)
        .option("compression", "xz")
        .mode("append")
        .save()
    )
    back = IO.read_lines(spark, out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    )


# Hadoop-fallback codec round-trips (r13, VERDICT r12 #4): the facade
# routes non-stdlib codec extensions (_FALLBACK_EXTS) to the Hadoop
# text reader — these queries prove that route END-TO-END through
# DIA.ReadLines for every fallback codec this runtime can actually
# decode (lz4/snappy/deflate; zstd's native library is absent here, so
# its coverage is the plan-time availability error, unit-tested in
# tests/test_api.py). Write side: Spark's text sink with the matching
# Hadoop codec.
def _codec_lines_roundtrip(
    spark: SparkSession, sf_dir: str, codec: str, tag: str
) -> DataFrame:
    from thrill_spark.api import V, ThrillContext

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("text").cast("string").alias("value")
    )
    out = scratch_dir(spark, f"{tag}_lines")
    docs.write.mode("overwrite").option("compression", codec).text(out)
    dia = ThrillContext(spark).ReadLines(out)
    return dia.df.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length(V)).alias("total_chars"),
    )


_SQL_CODEC_LINES = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """


@query("io_lz4_lines_roundtrip", _SQL_CODEC_LINES)
def q_io_lz4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lz4-framed lines through the facade's Hadoop-codec fallback
    (per-file order; the codec stream is not byte-range servable)."""
    return _codec_lines_roundtrip(spark, sf_dir, "lz4", "lz4")


@query("io_snappy_lines_roundtrip", _SQL_CODEC_LINES)
def q_io_snappy_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snappy-framed lines through the facade's Hadoop-codec fallback."""
    return _codec_lines_roundtrip(spark, sf_dir, "snappy", "snappy")


@query("io_deflate_lines_roundtrip", _SQL_CODEC_LINES)
def q_io_deflate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deflate (raw zlib) lines through the facade's Hadoop-codec
    fallback."""
    return _codec_lines_roundtrip(spark, sf_dir, "deflate", "deflate")


def has_hadoop_native_zstd() -> bool:
    """True when Hadoop's ZStandardCodec can actually decode here:
    both the system libzstd AND the native libhadoop bridge must be
    loadable (the codec class always resolves; without the natives it
    throws 'native zStandard library not available' at first use —
    the exact failure api._require_hadoop_codec turns into a clear
    plan-time error). No-Spark probe (the tws.py capability pattern,
    VERDICT r13 #6) so registration can run at import time."""
    import ctypes.util
    import glob as _glob

    if ctypes.util.find_library("zstd") is None:
        return False
    roots = [
        os.environ.get("HADOOP_HOME"),
        os.environ.get("HADOOP_COMMON_HOME"),
        os.environ.get("HADOOP_PREFIX"),
    ]
    return any(
        _glob.glob(os.path.join(r, "lib", "native", "libhadoop*"))
        for r in roots
        if r
    )


def _register_zst_roundtrip(probe=has_hadoop_native_zstd, register=query) -> bool:
    """Register io_zst_lines_roundtrip ONLY where Hadoop's native zstd
    loads: deployment environments (EMR/Dataproc-style, HADOOP_HOME
    with lib/native) get the oracle row for free, while a natives-less
    sandbox keeps the plan-time 'codec unavailable' error (unit-tested
    in tests/test_api.py) instead of a permanently red row."""
    if not probe():
        return False

    @register("io_zst_lines_roundtrip", _SQL_CODEC_LINES)
    def q_io_zst_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
        """zstd lines through the facade's Hadoop-codec fallback —
        registered conditionally by _register_zst_roundtrip."""
        return _codec_lines_roundtrip(spark, sf_dir, "zstd", "zst")

    return True


_register_zst_roundtrip()


# Mixed-codec directory (thrill/vfs/file_io.cpp:42-58: the reference
# picks the decompression filter PER FILE from its extension, so one
# directory can legally mix plain, .gz, and .xz members): a third of
# the corpus is written with each codec into ONE directory and a
# single read_lines scan unions the Hadoop-codec members (plain, gz)
# with the per-file lzma pass (xz). At scale the read stays parallel:
# per-split for plain, per-file for the non-splittable codecs.
@query(
    "io_mixed_codec_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_io_mixed_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import shutil

    from thrill_spark.sources import linesource

    linesource.register(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = scratch_dir(spark, "mixed_codec")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    staging = {}
    for tag, codec in (("plain", None), ("gz", "gzip")):
        part = docs.filter(
            F.col("doc_id") % 3 == (0 if tag == "plain" else 1)
        ).select(F.col("text").cast("string").alias("value"))
        d = os.path.join(out, f"_stage_{tag}")
        w = part.write.mode("overwrite")
        if codec:
            w = w.option("compression", codec)
        w.text(d)
        staging[tag] = d
    (
        docs.filter(F.col("doc_id") % 3 == 2)
        .select(F.col("text").alias("line"))
        .write.format("thrill_lines")
        .option("path", out)
        .option("compression", "xz")
        .mode("append")
        .save()
    )
    # surface the staged part files as direct members of the mixed dir
    for tag, d in staging.items():
        for i, f in enumerate(sorted(_glob.glob(os.path.join(d, "part-*")))):
            os.replace(f, os.path.join(out, f"{tag}-{i:05d}{os.path.splitext(f)[1] or '.txt'}"))
        shutil.rmtree(d, ignore_errors=True)
    back = IO.read_lines(spark, out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    )


# Size-targeted WriteLines (thrill/api/write_lines.hpp:33 +
# dia.hpp:823-845 `$$$$$`/`#####` templating): the reference re-shards
# text output into files of a target size; write_lines(target_file_
# bytes=) measures the payload with one aggregate and round-robin
# repartitions to ceil(total/target) files. Oracle checks content
# round-trip AND that the achieved file count equals the size-derived
# expectation.
@query(
    "io_lines_sized_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           TRUE AS file_count_ok
    FROM documents
    """,
)
def q_io_lines_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import math as _math

    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "lines_sized")
    target = 64 * 1024  # small target so even sf0.001 yields several files
    n_files = IO.write_lines(docs, out, target_file_bytes=target)
    n_parts = len(_glob.glob(os.path.join(out, "part-*")))
    total = docs.agg(
        F.sum(F.octet_length("line") + F.lit(1)).alias("b")
    ).collect()[0]["b"]
    expect = max(1, _math.ceil(int(total) / target))
    back = IO.read_lines(spark, out)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    ).withColumn("file_count_ok", F.lit(bool(n_parts == n_files == expect)))


# Approximate quantiles with a band oracle (the HLL pattern): the
# t-digest/GK estimate must land within the rank-error band of the
# exact interpolated percentile computed in the same plan.
@query(
    "fn_approx_quantiles",
    """
    SELECT quantile_cont(o_totalprice, 0.5) AS exact_p50, TRUE AS approx_ok
    FROM orders
    """,
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    err = 0.01
    agg = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("o_totalprice", 0.5, int(1 / err)).alias("_ap50"),
        F.expr("percentile(o_totalprice, array(0.49, 0.51))").alias("_band"),
    )
    # rank-error guarantee: the approx p50 must sit between the exact
    # p49 and p51 (rank band +-err around the target quantile)
    return agg.select(
        "exact_p50",
        (
            (F.col("_ap50") >= F.element_at("_band", 1))
            & (F.col("_ap50") <= F.element_at("_band", 2))
        ).alias("approx_ok"),
    )


# WriteLinesOne (single-file sink) + glob-pattern ReadLines: the output
# must be exactly one part file (emitted as an oracle-checked boolean)
# and reading it back through a glob must reproduce the content.
@query(
    "io_lines_one_glob_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           TRUE AS single_file
    FROM documents
    """,
)
def q_io_lines_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "lines_one")
    IO.write_lines_one(docs, out)
    n_parts = len(_glob.glob(os.path.join(out, "part-*")))
    back = IO.read_lines(spark, os.path.join(out, "part-*"))
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    ).withColumn("single_file", F.lit(bool(n_parts == 1)))


# ---------------------------------------------------------------------------
# k-core decomposition (Seidman peel) — deterministic structured graph
# derived from orders ids: tree edges i--i//2, i--i//3 plus a dense
# low-id chord band, so the peel genuinely cascades (7 rounds) and the
# 3-core is non-empty. Oracle = the peel UNROLLED 16 rounds (>2x the
# measured fixpoint depth at every sf); once converged, extra rounds
# are no-ops, so round-16 equals the fixpoint the Spark side iterates
# to (which raises if it ever fails to converge).
# ---------------------------------------------------------------------------
_KC_K = 3
_KC_ROUNDS = 16
_KC_MOD = 4096


def _sql_k_core() -> str:
    ctes = [
        f"ids AS MATERIALIZED (SELECT DISTINCT o_orderkey % {_KC_MOD} AS i FROM orders "
        f"WHERE o_orderkey % {_KC_MOD} >= 1)",
        """e AS MATERIALIZED (
          SELECT DISTINCT least(i, i // 2) AS u, greatest(i, i // 2) AS v
          FROM ids WHERE i <> i // 2
          UNION
          SELECT DISTINCT least(i, i // 3) AS u, greatest(i, i // 3) AS v
          FROM ids WHERE i <> i // 3
          UNION
          SELECT DISTINCT i - 3 AS u, i AS v FROM ids WHERE i < 64 AND i >= 3)""",
        "n0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM e UNION SELECT DISTINCT v AS n FROM e)",
    ]
    for r in range(1, _KC_ROUNDS + 1):
        ctes.append(
            f"ee{r} AS MATERIALIZED (SELECT e.u, e.v FROM e "
            f"JOIN n{r - 1} a ON a.n = e.u JOIN n{r - 1} b ON b.n = e.v)"
        )
        ctes.append(
            f"n{r} AS MATERIALIZED (SELECT n FROM (SELECT n, COUNT(*) AS d FROM "
            f"(SELECT u AS n FROM ee{r} UNION ALL SELECT v AS n FROM ee{r}) "
            f"GROUP BY n) WHERE d >= {_KC_K})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f""",
    eefin AS MATERIALIZED (SELECT e.u, e.v FROM e
      JOIN n{_KC_ROUNDS} a ON a.n = e.u JOIN n{_KC_ROUNDS} b ON b.n = e.v)
    SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM
      (SELECT u AS n FROM eefin UNION ALL SELECT v AS n FROM eefin)
    GROUP BY n
    """
    )


@query("k_core_orders", _sql_k_core())
def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ids = (
        o.select((F.col("o_orderkey") % _KC_MOD).alias("i"))
        .filter(F.col("i") >= 1)
        .distinct()
    )
    half = F.expr("i DIV 2")
    third = F.expr("i DIV 3")
    e1 = ids.filter(F.col("i") != half).select(
        F.least(F.col("i"), half).alias("u"), F.greatest(F.col("i"), half).alias("v")
    )
    e2 = ids.filter(F.col("i") != third).select(
        F.least(F.col("i"), third).alias("u"), F.greatest(F.col("i"), third).alias("v")
    )
    e3 = ids.filter((F.col("i") < 64) & (F.col("i") >= 3)).select(
        (F.col("i") - 3).alias("u"), F.col("i").alias("v")
    )
    edges = e1.unionByName(e2).unionByName(e3).distinct()
    return A.k_core(edges, _KC_K)


# ---------------------------------------------------------------------------
# Weighted SSSP on the deterministic doubling/tripling DAG (i -> 2i,
# i -> 3i, ascending so acyclic): Spark runs Bellman-Ford rounds to a
# certified fixpoint; the oracle enumerates ALL paths from the source
# with a recursive CTE (finite on a DAG) and takes the min per node.
# ---------------------------------------------------------------------------
_SSSP_MOD = 4096


@query(
    "sssp_weighted_dag",
    f"""
    WITH RECURSIVE ids AS MATERIALIZED (
      SELECT DISTINCT o_orderkey % {_SSSP_MOD} AS i FROM orders
      WHERE o_orderkey % {_SSSP_MOD} >= 1),
    e AS MATERIALIZED (
      SELECT i AS src, i * 2 AS dst, (i * 2 % 97) + 1 AS w FROM ids
      WHERE i * 2 < {_SSSP_MOD}
      UNION ALL
      SELECT i AS src, i * 3 AS dst, (i * 3 % 97) + 1 AS w FROM ids
      WHERE i * 3 < {_SSSP_MOD}),
    walk(node, d) AS (
      SELECT CAST(MIN(i) AS BIGINT), CAST(0 AS BIGINT) FROM ids
      UNION ALL
      SELECT e.dst, w.d + e.w FROM walk w JOIN e ON e.src = w.node)
    SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY node
    """,
)
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ids = (
        o.select((F.col("o_orderkey") % _SSSP_MOD).alias("i"))
        .filter(F.col("i") >= 1)
        .distinct()
    )
    e2 = ids.filter(F.col("i") * 2 < _SSSP_MOD).select(
        F.col("i").alias("src"),
        (F.col("i") * 2).alias("dst"),
        ((F.col("i") * 2) % 97 + 1).alias("w"),
    )
    e3 = ids.filter(F.col("i") * 3 < _SSSP_MOD).select(
        F.col("i").alias("src"),
        (F.col("i") * 3).alias("dst"),
        ((F.col("i") * 3) % 97 + 1).alias("w"),
    )
    edges = e2.unionByName(e3)
    source = ids.agg(F.min("i")).collect()[0][0]
    return A.sssp(edges, int(source))


# ---------------------------------------------------------------------------
# DC3 / skew suffix sorting (examples/suffix_sorting/dc3.hpp) over the
# concatenation of the first 20 documents (~6 KB): big enough that the
# recursion genuinely runs distributed levels before the driver-side
# base case. Oracle: exact ORDER BY substr suffix ranks on the same
# concatenated string (all suffixes of one string are pairwise
# distinct). Complements suffix_array_doc0 (prefix doubling) — same
# output contract, the reference's other algorithm.
# ---------------------------------------------------------------------------
@query(
    "suffix_array_dc3",
    """
    WITH s AS (SELECT string_agg(text, '' ORDER BY doc_id) AS str
               FROM documents WHERE doc_id < 20),
    p AS (SELECT str, unnest(generate_series(0, length(str)-1)) AS pos FROM s)
    SELECT pos,
           CAST(ROW_NUMBER() OVER (ORDER BY substr(str, pos+1)) - 1 AS BIGINT)
             AS rank
    FROM p
    """,
)
def q_suffix_array_dc3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    # concatenation offsets + total chars via the driver-gated rollup
    lens = docs.select("doc_id", F.length("text").alias("_len"))
    offs, n = A.doc_offsets(lens)
    chars = A.chunked_chars(
        docs.join(offs.select("doc_id", "_off"), "doc_id"), off_col="_off"
    )
    return A.suffix_array_dc3(chars, n)


# DC7 (examples/suffix_sorting/dc7.cpp) — same workload and oracle as
# suffix_array_dc3; only the algorithm differs (7-periodic difference
# cover, 3n/7 recursion, pairwise counting merge — algorithms._dc7_rec).
@query(
    "suffix_array_dc7",
    """
    WITH s AS (SELECT string_agg(text, '' ORDER BY doc_id) AS str
               FROM documents WHERE doc_id < 20),
    p AS (SELECT str, unnest(generate_series(0, length(str)-1)) AS pos FROM s)
    SELECT pos,
           CAST(ROW_NUMBER() OVER (ORDER BY substr(str, pos+1)) - 1 AS BIGINT)
             AS rank
    FROM p
    """,
)
def q_suffix_array_dc7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    # concatenation offsets + total chars via the driver-gated rollup
    lens = docs.select("doc_id", F.length("text").alias("_len"))
    offs, n = A.doc_offsets(lens)
    chars = A.chunked_chars(
        docs.join(offs.select("doc_id", "_off"), "doc_id"), off_col="_off"
    )
    return A.suffix_array_dc7(chars, n)


# ---------------------------------------------------------------------------
# XML round-trip (Spark 4 native XML source — new connector surface
# beside text/csv/json/orc/parquet). Oracle: the aggregates of what
# came back must equal the source table's.
# ---------------------------------------------------------------------------
@query(
    "io_xml_roundtrip",
    """SELECT n_nationkey AS nationkey, n_regionkey AS regionkey, n_name AS name
       FROM nation""",
)
def q_io_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_regionkey").alias("regionkey"),
        F.col("n_name").alias("name"),
    )
    out = scratch_dir(spark, "xml")
    (
        n.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(out)
    )
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    return back.select(
        F.col("nationkey").cast("long"),
        F.col("regionkey").cast("long"),
        F.col("name").cast("string"),
    )


# ---------------------------------------------------------------------------
# Python DataSource WRITER round-trip: the custom thrill_lines source
# (byte-range ReadLines parity) now also writes — per-task temp files
# renamed into place on commit (two-phase, so failed/speculative
# tasks never surface partial parts). Write documents through it,
# read back through the byte-range reader.
# ---------------------------------------------------------------------------
@query(
    "io_datasource_write_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_io_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import shutil

    from thrill_spark.sources import linesource

    linesource.register(spark)
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    out = scratch_dir(spark, "ds_write")
    shutil.rmtree(out, ignore_errors=True)
    docs.write.format("thrill_lines").option("path", out).mode("append").save()
    parts = sorted(_glob.glob(os.path.join(out, "part-*.txt")))
    backs = [
        spark.read.format("thrill_lines")
        .option("path", p)
        .option("n_splits", "4")
        .load()
        for p in parts
    ]
    from functools import reduce

    back = reduce(lambda a, b: a.unionByName(b), backs)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("line")).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Suffix-sorting family completion (examples/suffix_sorting/): BWT
# (construct_bwt.hpp), run-length BWT (rl_bwt.cpp), and the LCP array
# (construct_lcp.hpp) — all derived from the doc0 suffix array the
# prefix-doubling query already ranks. LCP here is the direct
# adjacent-suffix comparison (n small); at corpus scale you'd run a
# distributed Kasai/Φ pass instead, same output contract.
# ---------------------------------------------------------------------------
def _doc0_ranked(spark: SparkSession, sf_dir: str):
    """(pos, rank) for doc0 + chars + the per-level rank tables (free:
    the doubling loop checkpoints them anyway; lcp_from_levels reads
    them instead of broadcasting the text)."""
    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0)
    chars = A.chunked_chars(doc, assume_single_row=True)
    # n from the 1-row text length — counting the exploded char table
    # would re-run the full explode as a throwaway pass (r11 lesson)
    n = int(doc.agg(F.sum(F.length("text")).alias("_n")).first()["_n"] or 0)
    ranked, levels = A.suffix_array(chars, n, step=8, keep_levels=True)
    return ranked, chars, levels


@query(
    "suffix_bwt_doc0",
    """
    WITH p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
               FROM documents WHERE doc_id = 0),
    r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS rnk,
                 text
          FROM p)
    SELECT CAST(rnk AS BIGINT) AS rank,
           CASE WHEN pos = 0 THEN '$' ELSE substr(text, pos, 1) END AS bwt_ch
    FROM r
    """,
)
def q_suffix_bwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows-Wheeler transform from the suffix array: bwt[r] is the
    character PRECEDING the rank-r suffix ('$' for the full-string
    suffix) — one join of the rank table against the shifted char
    table, no text reassembly."""
    ranked, chars, _ = _doc0_ranked(spark, sf_dir)
    prev = chars.select((F.col("pos") + 1).alias("pos"), F.col("ch").alias("_prev"))
    return (
        ranked.join(prev, "pos", "left")
        .select(
            F.col("rank"),
            F.coalesce(F.col("_prev"), F.lit("$")).alias("bwt_ch"),
        )
    )


@query(
    "suffix_rlbwt_doc0",
    """
    WITH p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
               FROM documents WHERE doc_id = 0),
    r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS rnk,
                 text
          FROM p),
    b AS (SELECT rnk,
                 CASE WHEN pos = 0 THEN '$' ELSE substr(text, pos, 1) END AS ch
          FROM r),
    g AS (SELECT rnk, ch,
                 rnk - ROW_NUMBER() OVER (PARTITION BY ch ORDER BY rnk) AS grp
          FROM b)
    SELECT ch, CAST(MIN(rnk) AS BIGINT) AS run_start,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM g GROUP BY ch, grp
    """,
)
def q_suffix_rlbwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length BWT (rl_bwt.cpp): gaps-and-islands over the BWT
    string — the compression step BWT exists for."""
    from pyspark.sql import Window

    ranked, chars, _ = _doc0_ranked(spark, sf_dir)
    prev = chars.select((F.col("pos") + 1).alias("pos"), F.col("ch").alias("_prev"))
    bwt = ranked.join(prev, "pos", "left").select(
        "rank", F.coalesce(F.col("_prev"), F.lit("$")).alias("ch")
    )
    w = Window.partitionBy("ch").orderBy("rank")
    g = bwt.withColumn("_grp", F.col("rank") - F.row_number().over(w))
    return g.groupBy("ch", "_grp").agg(
        F.min("rank").alias("run_start"),
        F.count("*").cast("long").alias("run_len"),
    ).drop("_grp")


@query(
    "suffix_lcp_doc0",
    """
    WITH p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
               FROM documents WHERE doc_id = 0),
    r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS rnk,
                 text
          FROM p),
    adj AS (
      SELECT rnk, text,
             substr(text, LAG(pos) OVER (ORDER BY rnk) + 1) AS s_prev,
             substr(text, pos + 1) AS s_cur
      FROM r),
    lcp AS (
      SELECT rnk,
             CASE WHEN s_prev IS NULL THEN 0
                  ELSE coalesce(
                    (SELECT MIN(i) - 1
                     FROM unnest(generate_series(1,
                            least(length(s_prev), length(s_cur)))) AS t(i)
                     WHERE substr(s_prev, i, 1) <> substr(s_cur, i, 1)),
                    least(length(s_prev), length(s_cur)))
             END AS v
      FROM adj)
    SELECT CAST(rnk AS BIGINT) AS rank, CAST(v AS BIGINT) AS lcp
    FROM lcp
    """,
)
def q_suffix_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCP array: lcp[r] = longest common prefix of the rank-r and
    rank-(r-1) suffixes (0 at r=0). Adjacent pairing via a lag join on
    rank; the prefix lengths come from binary descent over the
    doubling rank tables (algorithms.lcp_from_levels) — no suffix
    string is materialized and no text is broadcast."""
    ranked, _, levels = _doc0_ranked(spark, sf_dir)
    return A.lcp_from_levels(ranked, levels)


# Longest repeated substring — the classic SA+LCP application (the
# max adjacent-suffix LCP IS the longest repeat; the reference's
# suffix programs exist to serve exactly this kind of query,
# examples/suffix_sorting/). Emits the length and the
# lexicographically smallest repeat attaining it, reconstructed from
# the distributed chars table (never a text broadcast).
@query(
    "suffix_longest_repeat_doc0",
    """
    WITH p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
               FROM documents WHERE doc_id = 0),
    r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS rnk,
                 text
          FROM p),
    adj AS (
      SELECT rnk,
             substr(text, LAG(pos) OVER (ORDER BY rnk) + 1) AS s_prev,
             substr(text, pos + 1) AS s_cur
      FROM r),
    lcp AS (
      SELECT rnk,
             CASE WHEN s_prev IS NULL THEN 0
                  ELSE coalesce(
                    (SELECT MIN(i) - 1
                     FROM unnest(generate_series(1,
                            least(length(s_prev), length(s_cur)))) AS t(i)
                     WHERE substr(s_prev, i, 1) <> substr(s_cur, i, 1)),
                    least(length(s_prev), length(s_cur)))
             END AS v
      FROM adj),
    mx AS (SELECT COALESCE(MAX(v), 0) AS rep_len FROM lcp)
    SELECT CAST(mx.rep_len AS BIGINT) AS rep_len,
           COALESCE((SELECT MIN(substr(a.s_cur, 1, mx.rep_len))
                     FROM adj a JOIN lcp l ON a.rnk = l.rnk
                     WHERE l.v = mx.rep_len AND mx.rep_len > 0), '') AS lrs
    FROM mx
    """,
)
def q_suffix_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max(LCP) + winner extraction: suffix-sort doc0, binary-descent
    LCP over the doubling rank tables, take the scalar max, collapse
    ties to the single min-rank winner, then rebuild its substring by
    broadcasting that ONE (start, len) row against the chars table —
    the same distributed tail as suffix_lcs_doc01.

    Scale: suffix sort + LCP joins + one scalar agg + one bounded
    winner reconstruction; nothing funnels the text."""
    ranked, chars, levels = _doc0_ranked(spark, sf_dir)
    lcp = A.lcp_from_levels(ranked, levels)
    mx = lcp.agg(F.coalesce(F.max("lcp"), F.lit(0)).alias("rep_len"))
    # Collapse ties BEFORE broadcasting: among all max-LCP rows, the
    # MINIMUM rank's suffix carries the lexicographically smallest
    # repeat (equal-length prefixes order with their suffixes), so the
    # range-join broadcast is one (start, len) row even on periodic
    # text where max-LCP ties are O(n). The rank->pos lookup is a
    # distributed equi-join, not part of the broadcast.
    winner = (
        lcp.join(
            F.broadcast(mx),
            (F.col("lcp") == F.col("rep_len")) & (F.col("lcp") > 0),
        )
        .join(ranked, "rank")
        .agg(F.min(F.struct("rank", "pos", "lcp")).alias("_w"))
        .select(F.col("_w.pos").alias("_s"), F.col("_w.lcp").alias("_L"))
    )
    best = (
        chars.join(
            F.broadcast(winner),
            (F.col("pos") >= F.col("_s"))
            & (F.col("pos") < F.col("_s") + F.col("_L")),
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("lrs")
        )
    )
    return mx.crossJoin(F.broadcast(best)).select(
        F.col("rep_len").cast("long").alias("rep_len"),
        F.coalesce("lrs", F.lit("")).alias("lrs"),
    )


# True ExactSubstr cross-document duplication via the GENERALIZED
# suffix array (Lee et al., "Deduplicating Training Data Makes
# Language Models Better" — the exact-substring dedup the n-gram-cover
# query approximates; reference workload: examples/suffix_sorting/).
# Suffixes sharing a >=L-char prefix form a CONTIGUOUS rank interval,
# so maximal runs of adjacent-LCP >= L are exactly the distinct
# L-char substrings; a run whose in-document members span >= 2 docs is
# a cross-document duplicate.
_XS_DOCS = 64
_XS_L = 16


_DOC_CHUNK = 4096


def _chunk_for(offs: DataFrame) -> int:
    """Chunk width for _label_doc, sized to the corpus: the join
    intermediate is positions × (docs overlapping a chunk) ≈
    positions × (chunk/avg_doc_len + 1), so a fixed 4096 inflates it
    ~400× on a 10-char-doc corpus (r11 ADVICE). One scalar aggregate
    pins chunk ≈ avg doc length (power of two, clamped to
    [64, _DOC_CHUNK]) → ≈2× fanout for any document size mix. The
    containment filter keeps results exact for ANY chunk width."""
    row = offs.agg(F.avg("_len").alias("a")).first()
    avg = int(row["a"]) if row and row["a"] else _DOC_CHUNK
    return max(64, min(_DOC_CHUNK, 1 << max(0, int(avg) - 1).bit_length()))


def _label_doc(posed: DataFrame, offs: DataFrame, pos_col: str = "pos") -> DataFrame:
    """Attach (doc_id, _off, _end) to every row holding a global
    character position — the doc-boundary range join done as a
    chunk-keyed EQUI-join: the offset table explodes to one row per
    chunk it overlaps (~n/chunk rows total), positions key on
    pos div chunk, and the containment filter picks the owning doc.
    Chunk width ≈ avg doc length (_chunk_for) bounds the per-chunk
    doc fanout at ~2× for tiny-document corpora. No broadcast of the
    per-doc table: at billions of documents a broadcast range join
    dies on the driver, while this shape is a plain linear equi-join
    (and at test scale the tiny spans side still auto-broadcasts on
    its honest stats)."""
    chunk = _chunk_for(offs)
    spans = offs.filter(F.col("_len") > 0).select(
        "doc_id",
        "_off",
        (F.col("_off") + F.col("_len")).alias("_end"),
        F.explode(
            F.sequence(
                F.floor(F.col("_off") / chunk).cast("long"),
                F.floor(
                    (F.col("_off") + F.col("_len") - 1) / chunk
                ).cast("long"),
            )
        ).alias("_chk"),
    )
    return (
        posed.withColumn(
            "_chk", F.floor(F.col(pos_col) / chunk).cast("long")
        )
        .join(spans, "_chk")
        .filter(
            (F.col(pos_col) >= F.col("_off")) & (F.col(pos_col) < F.col("_end"))
        )
        .drop("_chk")
    )


def _exact_substr_members(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int | None = None,
    min_len: int | None = None,
):
    """(members, offsets, chars): (doc_id, pos, _isl) for every
    in-document L-char occurrence of the doc_id<n_docs corpus, the
    per-doc offset/length table, and the global (pos, ch) char table
    the SA was built from (reused by the cleaner for survivor-text
    reconstruction). Islands = maximal adjacent-LCP >= L rank runs
    over the generalized SA (see q_exact_substr_sa).

    n_docs / min_len default to the registered queries' fixed
    _XS_DOCS / _XS_L; tools/scale_check.py passes larger corpora
    directly instead of monkey-patching the module constants."""
    n_docs = _XS_DOCS if n_docs is None else n_docs
    min_len = _XS_L if min_len is None else min_len
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < n_docs
    )
    lens = docs.select("doc_id", F.length("text").alias("_len"))
    # offsets + total chars in ONE driver-gated rollup (A.doc_offsets)
    offs, n = A.doc_offsets(lens)
    chars = A.chunked_chars(
        docs.join(offs.select("doc_id", "_off"), "doc_id"), off_col="_off"
    )
    # Islands = equivalence classes of "same first L chars", which
    # prefix_classes assembles straight from the rank ladder — so the
    # ladder stops at prefix length >= L: O(log L) doubling rounds,
    # INDEPENDENT of corpus size, with no full suffix order, no
    # exact-LCP descent, and no adjacency prefix-sum (r11; the full
    # O(log n) sort + descent shape is still what suffix_lcp*/LCS
    # use, where exact order and LCP values are the answer).
    _, levels = A.suffix_array(
        chars, n, step=8, keep_levels=True, max_prefix=min_len
    )
    cls = A.prefix_classes(levels, min_len)
    # document label + in-document validity per suffix start (chunk-
    # keyed equi-join, not a broadcast range join — see _label_doc)
    mem = (
        _label_doc(cls, offs)
        .filter(F.col("pos") + min_len <= F.col("_end"))
        .select("doc_id", "pos", F.col("cls").alias("_isl"))
    )
    return mem, offs, chars


@query(
    "dedup_exact_substr_sa",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_XS_DOCS}),
    s AS (SELECT doc_id, substr(text, i, {_XS_L}) AS sub
          FROM d, unnest(generate_series(1, length(text) - {_XS_L} + 1)) AS t(i)),
    g AS (SELECT sub, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS nd
          FROM s GROUP BY sub)
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_substrings,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences
    FROM g WHERE nd >= 2 GROUP BY nd
    """,
)
def q_exact_substr_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring cross-doc duplication profile: generalized SA
    over the doc_id<{D} corpus (distributed offsets + chunked chars),
    binary-descent LCP, then gaps-and-islands on lcp >= L via the
    distributed prefix-sum — each island IS one distinct L-char
    substring; island members are labeled with their document by a
    broadcast range-join against the offset table and filtered to
    occurrences that stay inside one document. Emits, per
    documents-spanned count, how many distinct duplicated substrings
    exist and their total occurrences. The DuckDB oracle re-derives
    the same profile by brute-force substring grouping.

    Scale: suffix sort O(n log n) + LCP joins + one prefix-sum + one
    keyed island aggregation — at corpus scale this is the production
    ExactSubstr shape (the SA machinery already scale-checked at
    `scale_check.py heavy`); nothing funnels the corpus."""
    return exact_substr_profile(spark, sf_dir)


def exact_substr_profile(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int | None = None,
    min_len: int | None = None,
) -> DataFrame:
    """Parameterized ExactSubstr duplication profile (corpus size and
    match length as arguments) — the entry tools/scale_check.py heavy
    mode drives at K-scaled corpora; the registered query pins
    (n_docs, min_len) = (_XS_DOCS, _XS_L) for the oracle."""
    mem, _, _ = _exact_substr_members(spark, sf_dir, n_docs, min_len)
    g = mem.groupBy("_isl").agg(
        F.count("*").alias("occ"), F.countDistinct("doc_id").alias("nd")
    )
    return (
        g.filter(F.col("nd") >= 2)
        .groupBy(F.col("nd").cast("long").alias("n_docs"))
        .agg(
            F.count("*").cast("long").alias("n_substrings"),
            F.sum("occ").cast("long").alias("n_occurrences"),
        )
    )


@query(
    "dedup_exact_substr_full",
    f"""
    WITH s AS (SELECT doc_id, substr(text, i, {_XS_L}) AS sub
          FROM documents,
               unnest(generate_series(1, length(text) - {_XS_L} + 1)) AS t(i)),
    g AS (SELECT sub, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS nd
          FROM s GROUP BY sub)
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_substrings,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences
    FROM g WHERE nd >= 2 GROUP BY nd
    """,
)
def q_exact_substr_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_exact_substr_sa over the ENTIRE documents table (no
    doc_id cap): one generalized suffix array across every document at
    the scale factor — 500 docs / 149k chars at sf0.01, 5000 docs /
    1.49M chars at sf0.1 — proving the production ExactSubstr shape is
    not a fixed-subset demo. Same plan as the capped query; only the
    corpus filter widens (r10 measured the full-table run sub-linear:
    10x the characters for 2.5x the time, BENCH_NOTES)."""
    return exact_substr_profile(spark, sf_dir, n_docs=1 << 62)


@query(
    "dedup_exact_substr_coverage",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_XS_DOCS}),
    s AS (SELECT doc_id, i, substr(text, i, {_XS_L}) AS sub
          FROM d, unnest(generate_series(1, length(text) - {_XS_L} + 1)) AS t(i)),
    g AS (SELECT sub FROM s GROUP BY sub HAVING COUNT(DISTINCT doc_id) >= 2),
    occ AS (SELECT s.doc_id, s.i FROM s JOIN g USING (sub)),
    cov AS (SELECT DISTINCT doc_id, i + j AS off
            FROM occ, unnest(generate_series(0, {_XS_L - 1})) AS t(j))
    SELECT d.doc_id,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS covered_chars,
           CAST(length(d.text) AS BIGINT) AS doc_len
    FROM d LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id) c
      USING (doc_id)
    """,
)
def q_exact_substr_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable output of ExactSubstr dedup: per document, how
    many characters are covered by some cross-document duplicated
    L-char substring — the span a Lee-et-al-style cleaner would cut.
    Island members of >=2-doc islands explode to their L covered
    offsets (bounded: occurrences x L, duplicated text only — never
    the whole corpus), distinct per (doc, offset), counted per doc.

    Scale: the member table is the dup-only subset; the explode factor
    is the constant L; everything else is keyed aggregation."""
    mem, offs, _ = _exact_substr_members(spark, sf_dir)
    nd = mem.groupBy("_isl").agg(F.countDistinct("doc_id").alias("_nd"))
    dup = mem.join(nd.filter(F.col("_nd") >= 2), "_isl", "left_semi")
    cov = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(_XS_L - 1))
            ).alias("_o"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("_covered"))
    )
    return (
        offs.select("doc_id", "_len")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_covered", F.lit(0)).cast("long").alias("covered_chars"),
            F.col("_len").cast("long").alias("doc_len"),
        )
    )


@query(
    "dedup_exact_substr_clean",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_XS_DOCS}),
    s AS (SELECT doc_id, i, substr(text, i, {_XS_L}) AS sub
          FROM d, unnest(generate_series(1, length(text) - {_XS_L} + 1)) AS t(i)),
    g AS (SELECT sub FROM s GROUP BY sub HAVING COUNT(DISTINCT doc_id) >= 2),
    occ AS (SELECT s.doc_id, s.i FROM s JOIN g USING (sub)),
    cov AS (SELECT DISTINCT doc_id, i + j AS off
            FROM occ, unnest(generate_series(0, {_XS_L - 1})) AS t(j)),
    pt AS (SELECT doc_id, i AS cpos, substr(text, i, 1) AS ch
           FROM d, unnest(generate_series(1, length(text))) AS t(i)),
    kept AS (
      SELECT pt.* FROM pt
      WHERE NOT EXISTS (SELECT 1 FROM cov
                        WHERE cov.doc_id = pt.doc_id AND cov.off = pt.cpos)),
    ka AS (SELECT doc_id, md5(string_agg(ch, '' ORDER BY cpos)) AS kept_fp,
                  COUNT(*) AS n_kept
           FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(length(d.text) AS BIGINT) AS doc_len,
           CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS kept_chars,
           coalesce(ka.kept_fp, md5('')) AS kept_fp
    FROM d LEFT JOIN ka USING (doc_id)
    """,
)
def q_exact_substr_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al ExactSubstr CLEANER output (the step the profile
    and coverage queries feed, "Deduplicating Training Data Makes
    Language Models Better" §3; reference workload:
    examples/suffix_sorting/): per document, CUT every character
    covered by a cross-document duplicated L-char substring and
    re-splice the remainders in order — emitting the survivor text's
    md5 fingerprint and kept length, so the oracle certifies the
    actual cleaned bytes, not just their count.

    Pipeline: generalized-SA islands -> >=2-doc islands' members
    explode to covered GLOBAL offsets (dup-only subset x constant L)
    -> anti-join the distributed char table -> label survivors by doc
    via the chunk-keyed equi-join (_label_doc: positions and doc
    spans meet on chunk keys sized ~avg doc length by _chunk_for,
    then a containment filter) -> per-doc ordered splice + md5. The per-doc assembly groups O(doc_len) char rows —
    bounded by the corpus' max document size, the same per-record
    unit the reference cleaner holds in memory; everything upstream
    stays keyed and distributed.

    The DuckDB oracle replays the semantics from first principles
    with a NOT-EXISTS anti-join over brute-force substring groups."""
    mem, offs, chars = _exact_substr_members(spark, sf_dir)
    nd = mem.groupBy("_isl").agg(F.countDistinct("doc_id").alias("_nd"))
    dup = mem.join(nd.filter(F.col("_nd") >= 2), "_isl", "left_semi")
    cov = dup.select(
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(_XS_L - 1))
        ).alias("pos")
    ).distinct()
    survivors = chars.join(cov, "pos", "left_anti")
    labeled = _label_doc(survivors, offs)
    ka = labeled.groupBy("doc_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            )
        ).alias("_fp"),
        F.count("*").alias("_n"),
    )
    return (
        offs.select("doc_id", "_len")
        .join(ka, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_len").cast("long").alias("doc_len"),
            F.coalesce("_n", F.lit(0)).cast("long").alias("kept_chars"),
            F.coalesce("_fp", F.md5(F.lit(""))).alias("kept_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Wavelet tree construction (construct_wt.hpp / wavelet_tree.cpp):
# symbols get dense 6-bit codes (alphabet <= 64 here); level l splits
# each node by bit (5-l) of the code, and the per-(level, node) 0/1
# bit counts ARE the rank structure the wavelet tree serves. Emitted
# as counts per node per level — the distributed representation of
# the reference's per-level bit vectors.
# ---------------------------------------------------------------------------
_WT_LEVELS = 6


@query(
    "suffix_wavelet_doc0",
    f"""
    WITH p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
               FROM documents WHERE doc_id = 0),
    ch AS (SELECT substr(text, pos+1, 1) AS c FROM p),
    alpha AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS code
              FROM (SELECT DISTINCT c FROM ch)),
    coded AS (SELECT code FROM ch JOIN alpha USING (c)),
    lv AS (SELECT code, unnest(generate_series(0, {_WT_LEVELS - 1})) AS level
           FROM coded)
    SELECT CAST(level AS INT) AS level,
           CAST(code // CAST(pow(2, {_WT_LEVELS} - level) AS BIGINT) AS BIGINT)
             AS node,
           CAST(COUNT(*) FILTER (WHERE (code // CAST(pow(2, {_WT_LEVELS - 1}
                - level) AS BIGINT)) % 2 = 0) AS BIGINT) AS n0,
           CAST(COUNT(*) FILTER (WHERE (code // CAST(pow(2, {_WT_LEVELS - 1}
                - level) AS BIGINT)) % 2 = 1) AS BIGINT) AS n1
    FROM lv GROUP BY level, node
    """,
)
def q_suffix_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark import ordering as O

    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0)
    chars = A.chunked_chars(doc, ch="c", assume_single_row=True)
    alpha = O.with_index(chars.select("c").distinct(), ["c"], name="code")
    coded = chars.join(alpha, "c").select("code")
    lv = coded.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(_WT_LEVELS - 1))).alias("level"),
    )
    node = F.expr(
        f"code div cast(pow(2, {_WT_LEVELS} - level) as bigint)"
    )
    bit = F.expr(
        f"code div cast(pow(2, {_WT_LEVELS - 1} - level) as bigint)"
    ) % 2
    return lv.groupBy(
        F.col("level").cast("int").alias("level"), node.cast("long").alias("node")
    ).agg(
        F.count_if(bit == 0).cast("long").alias("n0"),
        F.count_if(bit == 1).cast("long").alias("n1"),
    )


# ---------------------------------------------------------------------------
# Second fixture column for the suffix family (the reference's suffix
# programs take ANY input sequence — examples/suffix_sorting reads
# arbitrary files): LCP + wavelet over the concatenated part-name
# string instead of documents.text — different alphabet (lowercase +
# space, heavy word repetition across names → long LCPs), same output
# contracts as the doc0 queries.
# ---------------------------------------------------------------------------
def _partnames_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row `_txt` frame: p_name of the first 40 parts joined by ' '
    in p_partkey order (array_sort on (key, name) structs — an
    order-deterministic aggregate, unlike bare collect_list)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 40)
    return part.agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p_partkey", "p_name"))),
                lambda s: s["p_name"],
            ),
            " ",
        ).alias("_txt")
    )


@query(
    "suffix_lcp_partnames",
    """
    WITH s AS (SELECT string_agg(p_name, ' ' ORDER BY p_partkey) AS text
               FROM part WHERE p_partkey <= 40),
    p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
          FROM s),
    r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS rnk,
                 text
          FROM p),
    adj AS (
      SELECT rnk, text,
             substr(text, LAG(pos) OVER (ORDER BY rnk) + 1) AS s_prev,
             substr(text, pos + 1) AS s_cur
      FROM r),
    lcp AS (
      SELECT rnk,
             CASE WHEN s_prev IS NULL THEN 0
                  ELSE coalesce(
                    (SELECT MIN(i) - 1
                     FROM unnest(generate_series(1,
                            least(length(s_prev), length(s_cur)))) AS t(i)
                     WHERE substr(s_prev, i, 1) <> substr(s_cur, i, 1)),
                    least(length(s_prev), length(s_cur)))
             END AS v
      FROM adj)
    SELECT CAST(rnk AS BIGINT) AS rank, CAST(v AS BIGINT) AS lcp
    FROM lcp
    """,
)
def q_suffix_lcp_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    txt = _partnames_text(spark, sf_dir)
    chars = A.chunked_chars(txt, text_col="_txt", assume_single_row=True)
    # n from the 1-row text length, not a throwaway explode pass
    n = int(txt.agg(F.sum(F.length("_txt")).alias("_n")).first()["_n"] or 0)
    ranked, levels = A.suffix_array(chars, n, step=8, keep_levels=True)
    return A.lcp_from_levels(ranked, levels)


@query(
    "suffix_wavelet_partnames",
    f"""
    WITH s AS (SELECT string_agg(p_name, ' ' ORDER BY p_partkey) AS text
               FROM part WHERE p_partkey <= 40),
    p AS (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
          FROM s),
    ch AS (SELECT substr(text, pos+1, 1) AS c FROM p),
    alpha AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS code
              FROM (SELECT DISTINCT c FROM ch)),
    coded AS (SELECT code FROM ch JOIN alpha USING (c)),
    lv AS (SELECT code, unnest(generate_series(0, {_WT_LEVELS - 1})) AS level
           FROM coded)
    SELECT CAST(level AS INT) AS level,
           CAST(code // CAST(pow(2, {_WT_LEVELS} - level) AS BIGINT) AS BIGINT)
             AS node,
           CAST(COUNT(*) FILTER (WHERE (code // CAST(pow(2, {_WT_LEVELS - 1}
                - level) AS BIGINT)) % 2 = 0) AS BIGINT) AS n0,
           CAST(COUNT(*) FILTER (WHERE (code // CAST(pow(2, {_WT_LEVELS - 1}
                - level) AS BIGINT)) % 2 = 1) AS BIGINT) AS n1
    FROM lv GROUP BY level, node
    """,
)
def q_suffix_wavelet_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark import ordering as O

    txt = _partnames_text(spark, sf_dir)
    chars = A.chunked_chars(txt, text_col="_txt", ch="c", assume_single_row=True)
    alpha = O.with_index(chars.select("c").distinct(), ["c"], name="code")
    coded = chars.join(alpha, "c").select("code")
    lv = coded.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(_WT_LEVELS - 1))).alias("level"),
    )
    node = F.expr(f"code div cast(pow(2, {_WT_LEVELS} - level) as bigint)")
    bit = F.expr(f"code div cast(pow(2, {_WT_LEVELS - 1} - level) as bigint)") % 2
    return lv.groupBy(
        F.col("level").cast("int").alias("level"), node.cast("long").alias("node")
    ).agg(
        F.count_if(bit == 0).cast("long").alias("n0"),
        F.count_if(bit == 1).cast("long").alias("n1"),
    )


# Prefix QUADRUPLING (prefix_quadrupling.cpp): same output contract as
# suffix_array_doc0, half the rounds with 4-wide rank tuples.
@query(
    "suffix_array_quadrupling_doc0",
    """
    SELECT pos,
           CAST(ROW_NUMBER() OVER (ORDER BY substr(text, pos+1)) - 1 AS BIGINT) AS rank
    FROM (SELECT text, unnest(generate_series(0, length(text)-1)) AS pos
          FROM documents WHERE doc_id = 0)
    """,
)
def q_suffix_array_quad(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0)
    chars = A.chunked_chars(doc, assume_single_row=True)
    # n from the 1-row text length, not a throwaway explode pass
    n = int(doc.agg(F.sum(F.length("text")).alias("_n")).first()["_n"] or 0)
    return A.suffix_array(chars, n, step=8)


# ---------------------------------------------------------------------------
# Strongly connected components (iterative FW-BW coloring) on a
# deterministic directed graph derived from orders: 12 rings of 10
# nodes (block-internal successor cycles) plus one-way even->odd
# block links — 12 size-10 SCCs the one-way links must NOT merge,
# structured so half the SCCs are color roots each round (2 peel
# rounds, exercising BOTH the multi-class peel and the re-color on
# the remainder). Oracle:
# full reachability closure by recursive CTE, scc_id = min mutual-
# reach partner (the definition itself, not the algorithm).
# ---------------------------------------------------------------------------
@query(
    "graph_scc",
    """
    WITH RECURSIVE n AS (
      SELECT DISTINCT o_orderkey % 120 AS u FROM orders),
    e AS (
      SELECT u, (u - u % 10) + (u + 1) % 10 AS v FROM n
      UNION
      SELECT u, u + 17 FROM n WHERE u % 10 = 0 AND (u // 10) % 2 = 0),
    reach(a, b) AS (
      SELECT u, v FROM e
      UNION
      SELECT r.a, e.v FROM reach r JOIN e ON e.u = r.b),
    mutual AS (
      SELECT r1.a AS v, r1.b AS w
      FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
    scc AS (
      SELECT n.u AS node,
             least(n.u, coalesce(MIN(m.w), n.u)) AS scc_id
      FROM n LEFT JOIN mutual m ON m.v = n.u
      GROUP BY n.u)
    SELECT CAST(node AS BIGINT) AS node, CAST(scc_id AS BIGINT) AS scc_id
    FROM scc
    """,
)
def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n = o.select((F.col("o_orderkey") % 120).alias("u")).distinct()
    ring = n.select(
        "u",
        ((F.col("u") - F.col("u") % 10) + (F.col("u") + 1) % 10).alias("v"),
    )
    cross = n.filter(
        (F.col("u") % 10 == 0) & (F.expr("(u div 10) % 2") == 0)
    ).select("u", (F.col("u") + 17).alias("v"))
    edges = ring.unionByName(cross).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    return A.strongly_connected_components(edges)


# ---------------------------------------------------------------------------
# Generalized suffix array: longest common substring of doc0 and doc1.
# The multi-string extension of the suffix-sorting family (reference
# examples/suffix_sorting/ sorts one sequence): concatenate with a
# unique separator, suffix-sort, and the LCS is the maximum LCP over
# ADJACENT rank pairs whose suffixes start in different documents.
# ---------------------------------------------------------------------------
_LCS_SEP = "\x01"  # smaller than every text char, never in the fixtures


@query(
    "suffix_lcs_doc01",
    """
    WITH a AS (SELECT text AS ta FROM documents WHERE doc_id = 0),
    b AS (SELECT text AS tb FROM documents WHERE doc_id = 1),
    ag AS (SELECT ta, unnest(generate_series(1, length(ta))) AS L FROM a),
    agi AS (SELECT ta, L, i FROM (
              SELECT ta, L, unnest(generate_series(1, length(ta))) AS i FROM ag)
            WHERE i <= length(ta) - L + 1),
    asub AS (SELECT DISTINCT L, substr(ta, i, L) AS sub FROM agi),
    bg AS (SELECT tb, unnest(generate_series(1, length(tb))) AS L FROM b),
    bgi AS (SELECT tb, L, i FROM (
              SELECT tb, L, unnest(generate_series(1, length(tb))) AS i FROM bg)
            WHERE i <= length(tb) - L + 1),
    bsub AS (SELECT DISTINCT L, substr(tb, i, L) AS sub FROM bgi),
    c AS (SELECT x.L, x.sub FROM asub x JOIN bsub y ON x.L = y.L AND x.sub = y.sub),
    mx AS (SELECT COALESCE(MAX(L), 0) AS lcs_len FROM c)
    SELECT CAST(mx.lcs_len AS BIGINT) AS lcs_len,
           COALESCE((SELECT MIN(sub) FROM c WHERE c.L = mx.lcs_len), '') AS lcs
    FROM mx
    """,
)
def q_suffix_lcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest common substring via a GENERALIZED suffix array:
    suffix-sort doc0 + SEP + doc1 (prefix doubling, the family's
    distributed path), reuse the LCP machinery on adjacent ranks, and
    take the max LCP over pairs whose suffixes start in different
    documents (the classic generalized-SA theorem; the separator is
    lexicographically minimal and absent from both texts, so no common
    prefix can span it). Emits the length and the lexicographically
    smallest substring attaining it. The oracle brute-forces the
    substring-set intersection per length, so the hash match certifies
    the suffix structure against first principles.

    Scale: suffix sort + one lag join + one scalar max + one filtered
    scalar min — at corpus scale the same plan runs on the DC7 sorter
    with Kasai LCP, identical output contract."""
    docs = load_table(spark, sf_dir, "documents")
    d0 = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("_t0"))
    d1 = docs.filter(F.col("doc_id") == 1).select(F.col("text").alias("_t1"))
    return suffix_lcs_core(d0, d1)


def suffix_lcs_core(d0: DataFrame, d1: DataFrame) -> DataFrame:
    """Generalized-SA LCS over two 1-row text frames (`_t0`, `_t1`) —
    the callable tools/scale_check.py stresses at K× input size. See
    q_suffix_lcs for the algorithm and oracle contract."""
    n0 = int(d0.select(F.length("_t0")).first()[0])  # bounded scalar
    # Generalized-SA ingestion stays per-document: each doc is its own
    # row with a base offset (doc0 carries the separator), so neither
    # text ever funnels through a single char-explode task.
    parts = d0.select(
        F.lit(0).alias("_off"),
        F.concat(F.col("_t0"), F.lit(_LCS_SEP)).alias("_t"),
    ).unionByName(
        d1.select(F.lit(n0 + 1).alias("_off"), F.col("_t1").alias("_t"))
    )
    chars = A.chunked_chars(parts, text_col="_t", off_col="_off")
    # total chars from the two 1-row text frames (one 2-row aggregate),
    # not a throwaway pass over the exploded char table
    n = int(parts.agg(F.sum(F.length("_t")).alias("_n")).first()["_n"] or 0)
    ranked, levels = A.suffix_array(chars, n, step=8, keep_levels=True)
    label = (
        F.when(F.col("pos") < n0, F.lit(0))
        .when(F.col("pos") == n0, F.lit(-1))
        .otherwise(F.lit(1))
    )
    rl = ranked.select("rank", "pos", label.alias("lab"))
    lcp = A.lcp_from_levels(ranked, levels)
    prev = rl.select(
        (F.col("rank") + 1).alias("rank"), F.col("lab").alias("plab")
    )
    cross = (
        rl.join(prev, "rank")
        .join(lcp, "rank")
        .filter(
            (F.col("lab") >= 0) & (F.col("plab") >= 0)
            & (F.col("lab") != F.col("plab"))
        )
        # used by BOTH the scalar max and the winner pick — checkpoint
        # so the label/LCP join tree isn't re-planned (and re-run) per
        # branch
        .localCheckpoint()
    )
    mx = cross.agg(F.coalesce(F.max("lcp"), F.lit(0)).alias("lcs_len"))
    # Reconstruct THE winning substring from the DISTRIBUTED chars
    # table. Ties are collapsed BEFORE any broadcast: suffix order is
    # lexicographic, so among all max-LCP winning rows the one with
    # the MINIMUM rank carries the lexicographically smallest L-char
    # prefix (equal-length prefixes order with their suffixes) — a
    # 1-row agg, so the range-join broadcast is a single (start, len)
    # row even on periodic text where ties are O(n).
    winner = (
        cross.join(
            F.broadcast(mx),
            (F.col("lcp") == F.col("lcs_len")) & (F.col("lcs_len") > 0),
        )
        .agg(F.min(F.struct("rank", "pos", "lcp")).alias("_w"))
        .select(F.col("_w.pos").alias("_s"), F.col("_w.lcp").alias("_L"))
    )
    best = (
        chars.join(
            F.broadcast(winner),
            (F.col("pos") >= F.col("_s"))
            & (F.col("pos") < F.col("_s") + F.col("_L")),
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("lcs")
        )
    )
    return mx.crossJoin(F.broadcast(best)).select(
        F.col("lcs_len").cast("long").alias("lcs_len"),
        F.coalesce("lcs", F.lit("")).alias("lcs"),
    )
