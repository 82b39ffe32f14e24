"""File sources/sinks with Thrill operator parity.

Reference behaviors being matched (not ported):
- ReadLines (thrill/api/read_lines.hpp:41-67): text glob -> DIA<string>,
  byte-range split per worker, gz/bz2 whole-file fallback. Spark's text
  source does identical split planning (splittable formats by range,
  compressed whole-file), so `spark.read.text(glob)` is the operator.
- WriteLines (thrill/api/write_lines.hpp:33): many files per worker with
  target size; WriteLinesOne (write_lines_one.hpp:31) sequences one
  file. Spark: df.write.text(dir) / coalesce(1) variant.
- ReadBinary/WriteBinary (read_binary.hpp:45, write_binary.hpp:36):
  round-trippable binary items. Parquet is the Spark-native equivalent
  (schema'd, splittable, compressed — strictly better than raw structs).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _local_matches(path: str) -> list[str]:
    """Files a local path/dir/glob resolves to (empty for remote URIs —
    those go straight to the Hadoop reader). Spark's hidden-file rule
    applies: names starting with '.' or '_' are ignored."""
    import glob as _glob

    p = str(path)
    if "://" in p:
        return []
    if os.path.isdir(p):
        hits = [os.path.join(p, f) for f in os.listdir(p)]
    else:
        hits = _glob.glob(p)
    return [
        f
        for f in hits
        if os.path.isfile(f) and not os.path.basename(f)[0] in "._"
    ]


def _read_lines_xz(spark: SparkSession, paths: list[str], name: str) -> DataFrame:
    """Lines from .xz files: whole-file reads through the binaryFile
    source (cluster-correct content transfer), lzma-decompressed in an
    Arrow-batched pass. xz streams are not splittable without a block
    index, so parallelism is per-file — exactly the reference's
    external-filter behavior (vfs/file_io.cpp:197+ pipes the whole
    stream through the xz binary)."""

    def _dec(batches):
        import lzma
        import re

        import pandas as pd

        # Hadoop LineRecordReader semantics, so an .xz file yields the
        # same rows its decompressed sibling would on the spark.read.text
        # path: CR, LF, and CRLF are all line terminators (the \r is
        # never part of the line), and undecodable bytes are tolerated
        # (replacement char) instead of aborting the scan mid-directory.
        _term = re.compile("\r\n|\r|\n")

        for pdf in batches:
            for content in pdf["content"]:
                text = lzma.decompress(bytes(content)).decode(
                    "utf-8", errors="replace"
                )
                lines = _term.split(text)
                if lines and lines[-1] == "":
                    lines.pop()
                yield pd.DataFrame({name: lines})

    binary = spark.read.format("binaryFile").load(paths)
    return binary.select("content").mapInPandas(_dec, schema=f"{name} string")


def read_lines(spark: SparkSession, path: str, name: str = "line") -> DataFrame:
    """ReadLines: text file(s)/glob -> one string column. Compression
    (.gz/.bz2/...) auto-detected by the Hadoop codec factory, matching
    the reference's vfs filter layer (thrill/vfs/gzip_filter.hpp).
    `.xz` — the third codec the reference recognizes
    (vfs/file_io.cpp:48-50) — has no Hadoop codec and is served by a
    per-file lzma pass (_read_lines_xz), transparently unioned with
    the Hadoop-read remainder for mixed directories."""
    matches = _local_matches(path)
    xz = [f for f in matches if f.endswith(".xz")]
    if xz:
        xz_df = _read_lines_xz(spark, xz, name)
        rest = [f for f in matches if not f.endswith(".xz")]
        if not rest:
            return xz_df
        return (
            spark.read.text(rest)
            .withColumnRenamed("value", name)
            .unionByName(xz_df)
        )
    return spark.read.text(path).withColumnRenamed("value", name)


def write_lines(
    df: DataFrame,
    path: str,
    col: str = "line",
    mode: str = "overwrite",
    target_file_bytes: int | None = None,
) -> int | None:
    """WriteLines: text files under `path` (the Spark analogue of the
    reference's per-worker `$$$$$`/`#####` path templating,
    thrill/api/write_lines.hpp:33 + dia.hpp:823-845).

    With ``target_file_bytes`` set, matches the reference's
    size-targeted multi-file output: one cheap aggregate measures the
    uncompressed payload (sum of line lengths + newline), the file
    count is ceil(total/target), and a round-robin repartition sizes
    the output evenly — the same re-sharding `compact_files` does for
    parquet, exposed on the write path. Returns the file count used
    (None when untargeted). At 100 TB this is one extra narrow scan +
    one shuffle, both O(data); the alternative (unsized 1-file-per-
    input-partition output) produces the small-file swamp downstream
    listings pay for forever.
    """
    out = df.select(F.col(col).cast("string").alias("value"))
    n_files = None
    if target_file_bytes is not None:
        import math

        # octet_length, not length: character count undercounts
        # multi-byte UTF-8 payloads, drifting file sizes above target
        # on non-ASCII corpora.
        total = out.agg(
            F.coalesce(F.sum(F.octet_length("value") + F.lit(1)), F.lit(0)).alias("b")
        ).collect()[0]["b"]
        n_files = max(1, math.ceil(int(total) / int(target_file_bytes)))
        out = out.repartition(n_files)
    out.write.mode(mode).text(path)
    return n_files


def write_lines_one(df: DataFrame, path: str, col: str = "line", mode: str = "overwrite") -> None:
    """WriteLinesOne: single output file (coalesce(1) — driver-side
    sequencing, only for small outputs, same caveat as the reference's
    one-file sink)."""
    df.select(F.col(col).cast("string").alias("value")).coalesce(1).write.mode(mode).text(path)


def read_binary(spark: SparkSession, path: str) -> DataFrame:
    """ReadBinary: re-read WriteBinary output with schema preserved."""
    return spark.read.parquet(path)


def write_binary(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """WriteBinary: schema'd, splittable, round-trips with read_binary."""
    df.write.mode(mode).parquet(path)


def generate(spark: SparkSession, size: int, exprs: dict[str, Column] | None = None) -> DataFrame:
    """Generate (thrill/api/generate.hpp:37): DIA from f(i), i in [0,size).
    spark.range plans one partition per core slice — the same
    CalculateLocalRange split (generate.hpp:55-61) without custom code."""
    df = spark.range(size).withColumnRenamed("id", "i")
    if exprs:
        df = df.select("i", *[e.alias(n) for n, e in exprs.items()])
    return df


def from_vector(spark: SparkSession, rows: Sequence, schema) -> DataFrame:
    """EqualToDIA / ConcatToDIA / Distribute (thrill/api/equal_to_dia.hpp:30,
    distribute.hpp:33): driver-side vector scattered across workers.
    Spark's createDataFrame parallelizes the local collection."""
    return spark.createDataFrame(rows, schema=schema)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (beyond-reference connector; the reference's only text
    sink is WriteLines). Header on; doubles/timestamps use Spark's
    round-trippable defaults (shortest-repr, ISO-8601)."""
    df.write.option("header", True).mode(mode).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source with explicit schema (schema inference is a full extra
    pass over 100 TB — callers must supply one)."""
    return spark.read.option("header", True).schema(schema).csv(path)


# Spark's default JSON timestampFormat truncates to milliseconds;
# micros keep the round-trip lossless.
_JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — second columnar format beside parquet; same pushdown/
    pruning properties via Spark's native ORC reader."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (splittable at line granularity, so scans
    parallelize like text)."""
    df.write.option("timestampFormat", _JSON_TS_FMT).mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source; pass a schema for the same
    no-inference-pass-at-scale reason as read_csv."""
    r = spark.read.option("timestampFormat", _JSON_TS_FMT)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout: one directory per
    partition value. At 100 TB this is the difference between scanning
    everything and scanning one partition — a filter on a partition
    column prunes at *file listing* time (PartitionFilters in the scan
    node), before any I/O. Keep partition cardinality moderate (<=10k
    dirs) and pair with in-file sorting for row-group pruning."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def _parquet_file_count(spark: SparkSession, path: str) -> int:
    """Count data files in a parquet directory via the Hadoop FS API
    (works for any supported filesystem, not just file://)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            n += 1
    return n


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int | None = None,
    target_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into fewer,
    larger files — the maintenance job every streaming/incremental
    ingestion needs (a 100 TB table fed by micro-batches degrades into
    millions of KB-files whose listing + open overhead dominates
    scans).

    File count is either explicit (`target_files`) or size-derived:
    ceil(total_bytes / target_bytes), the standard ~512 MB target.
    Repartition (round-robin) rather than coalesce: coalesce would
    skew output sizes by collapsing adjacent small files unevenly and
    caps parallelism of the rewrite itself. Returns the achieved file
    count.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    if target_files is None:
        total = sum(
            st.getLen() for st in fs.listStatus(p) if st.isFile()
        )
        target_files = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(dst)
    return _parquet_file_count(spark, dst)


def write_with_manifest(df: DataFrame, path: str, key_col: str) -> dict:
    """Write parquet plus a `_manifest.json` recording row count and an
    order-insensitive content checksum (bit_xor of md5-derived 60-bit
    key hashes — associative/commutative, overflow-free, distributes
    as one aggregate). The
    manifest is what makes a dataset hand-off verifiable: the consumer
    re-derives both numbers with one scan and rejects partial or
    corrupted copies.
    """
    import json as _json

    from thrill_spark.functions.text import md5_long

    df.write.mode("overwrite").parquet(path)
    back = df.sparkSession.read.parquet(path)
    row = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(md5_long(F.col(key_col).cast("string"))).alias("chk"),
    ).collect()[0]
    manifest = {"n_rows": row["n"], "checksum": int(row["chk"]), "key_col": key_col}
    jvm = df.sparkSession.sparkContext._jvm
    conf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path + "/_manifest.json")
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    out.write(bytearray(_json.dumps(manifest).encode()))
    out.close()
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Re-derive the manifest numbers from the data and compare."""
    import json as _json

    from thrill_spark.functions.text import md5_long

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path + "/_manifest.json")
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    data = []
    while True:
        b = stream.read()
        if b < 0:
            break
        data.append(b)
    stream.close()
    manifest = _json.loads(bytes(data).decode())
    back = spark.read.parquet(path)
    row = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(md5_long(F.col(manifest["key_col"]).cast("string"))).alias("chk"),
    ).collect()[0]
    manifest["verified"] = (
        row["n"] == manifest["n_rows"] and int(row["chk"]) == manifest["checksum"]
    )
    return manifest
