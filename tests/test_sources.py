"""Source/sink tests: text + binary round-trips, glob, compression
(mirrors reference ReadLines/WriteLines/ReadBinary behaviors)."""

import gzip
import os
import tempfile

from pyspark.sql import functions as F

from thrill_spark.sources import io as IO


def test_lines_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="ts_lines_")
    df = spark.range(100).select(F.concat(F.lit("line-"), F.col("id")).alias("line"))
    IO.write_lines(df, d)
    back = IO.read_lines(spark, d)
    assert back.count() == 100
    assert back.filter(F.col("line") == "line-42").count() == 1


def test_write_lines_one_single_file(spark):
    d = tempfile.mkdtemp(prefix="ts_one_")
    df = spark.range(10).select(F.col("id").cast("string").alias("line")).repartition(4)
    IO.write_lines_one(df, d)
    files = [f for f in os.listdir(d) if f.startswith("part-")]
    assert len(files) == 1
    assert IO.read_lines(spark, d).count() == 10


def test_read_lines_gzip_and_glob(spark):
    # reference: vfs gzip filter + Glob (thrill/vfs/file_io.hpp:99-112)
    d = tempfile.mkdtemp(prefix="ts_gz_")
    with gzip.open(os.path.join(d, "a.txt.gz"), "wt") as f:
        f.write("alpha\nbeta\n")
    with open(os.path.join(d, "b.txt"), "w") as f:
        f.write("gamma\n")
    both = IO.read_lines(spark, os.path.join(d, "*"))
    assert sorted(r["line"] for r in both.collect()) == ["alpha", "beta", "gamma"]
    only_gz = IO.read_lines(spark, os.path.join(d, "*.gz"))
    assert only_gz.count() == 2


def test_binary_roundtrip_schema(spark):
    d = tempfile.mkdtemp(prefix="ts_bin_")
    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0]), (2, "y", [3.0])], ["k", "s", "arr"]
    )
    IO.write_binary(df, d)
    back = IO.read_binary(spark, d)
    assert back.schema == df.schema
    assert sorted((r["k"], r["s"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_generate(spark):
    df = IO.generate(spark, 1000, {"sq": F.col("i") * F.col("i")})
    assert df.count() == 1000
    assert df.filter(F.col("i") == 31).first()["sq"] == 961


def test_from_vector(spark):
    df = IO.from_vector(spark, [(1, "a"), (2, "b")], "k long, v string")
    assert df.count() == 2
