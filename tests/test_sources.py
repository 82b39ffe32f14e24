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


def test_write_lines_sized_counts_utf8_bytes(spark):
    """target_file_bytes sizes by OCTET length: a corpus of 3-byte
    UTF-8 chars must produce ~3x the files a char-count sizing would
    pick, keeping achieved file sizes at the target on non-ASCII
    text."""
    import math

    d = tempfile.mkdtemp(prefix="ts_sized_utf8_")
    # 200 lines x 30 chars of U+4E2D (3 bytes each) = 91 B/line incl \n
    df = spark.range(200).select(F.lit("中" * 30).alias("line"))
    target = 2048
    n = IO.write_lines(df, d, target_file_bytes=target)
    assert n == math.ceil(200 * (30 * 3 + 1) / target)  # bytes, not chars
    files = [f for f in os.listdir(d) if f.startswith("part-")]
    assert len(files) == n
    assert IO.read_lines(spark, d).count() == 200


def test_write_lines_one_single_file(spark):
    d = tempfile.mkdtemp(prefix="ts_one_")
    df = spark.range(10).select(F.col("id").cast("string").alias("line")).repartition(4)
    IO.write_lines_one(df, d)
    files = [f for f in os.listdir(d) if f.startswith("part-")]
    assert len(files) == 1
    assert IO.read_lines(spark, d).count() == 10


def test_read_lines_xz_and_mixed_dir(spark):
    """xz parity (reference vfs/file_io.cpp:48-50): .xz files decode
    through the per-file lzma pass and union transparently with
    plain/gz files in the same directory."""
    import lzma

    d = tempfile.mkdtemp(prefix="ts_xz_")
    with lzma.open(os.path.join(d, "a.txt.xz"), "wt") as f:
        f.write("alpha\nbeta\n")
    with open(os.path.join(d, "b.txt"), "w") as f:
        f.write("gamma\n")
    got = sorted(r["line"] for r in IO.read_lines(spark, d).collect())
    assert got == ["alpha", "beta", "gamma"]
    only_xz = IO.read_lines(spark, os.path.join(d, "*.xz"))
    assert sorted(r["line"] for r in only_xz.collect()) == ["alpha", "beta"]


def test_write_lines_xz_roundtrip(spark):
    from thrill_spark.sources import linesource

    linesource.register(spark)
    d = tempfile.mkdtemp(prefix="ts_xzw_") + "/out"
    df = spark.range(50).select(F.concat(F.lit("ln-"), F.col("id")).alias("line"))
    (
        df.write.format("thrill_lines")
        .option("path", d)
        .option("compression", "xz")
        .mode("append")
        .save()
    )
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    assert parts and all(f.endswith(".txt.xz") for f in parts)
    back = IO.read_lines(spark, d)
    assert sorted(r["line"] for r in back.collect()) == sorted(
        f"ln-{i}" for i in range(50)
    )


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


def test_bucketed_join_is_shuffle_free(spark):
    """Bucketing both sides by the join key must eliminate the
    join-time Exchange (the co-located join scale path)."""
    from thrill_spark.sources.bucketing import read_table, write_bucketed

    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bkt_a", ["k"], num_buckets=4)
    write_bucketed(b, "bkt_b", ["k"], num_buckets=4)
    try:
        # disable broadcast so the plan would otherwise shuffle
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_agg_on_zipf_skew(spark):
    """Salting must give byte-identical results to plain groupBy on a
    zipf-skewed key distribution (the reference motivates skew handling
    with common/zipf_distribution.hpp)."""
    import pyspark.sql.functions as F

    from thrill_spark.operators.skew import salted_agg, top_heavy_keys

    # zipf-ish: key k appears ~ N/k times
    df = (
        spark.range(1, 30)
        .selectExpr("id AS k", "CAST(3000 / id AS INT) AS reps")
        .selectExpr("k", "explode(sequence(1, reps)) AS i")
        .selectExpr("k", "k * 10 + i AS v")
    )
    plain = {
        (r["k"]): (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["total"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs={"_c": F.count("*"), "_s": F.sum("v")},
            final_aggs={"n": F.sum("_c").cast("long"), "total": F.sum("_s")},
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted
    heavy = top_heavy_keys(df, ["k"], top=1).collect()[0]
    assert heavy["k"] == 1 and heavy["share"] > 0.2  # planted skew detected


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from thrill_spark.sources import io as IO

    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(100)], ["k", "flag"]
    )
    out = str(tmp_path / "part")
    IO.write_partitioned(df, out, ["flag"])
    back = spark.read.parquet(out).filter(F.col("flag") == "A")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "flag" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == 50
    # pruned scan must not read the other partition's files
    assert "PushedFilters" in plan or "PartitionCount: 1" in plan


def test_csv_json_roundtrip_types(spark, tmp_path):
    import datetime as dt
    from thrill_spark.sources import io as IO

    rows = [(1, 0.1 + 0.2, dt.datetime(2024, 1, 2, 3, 4, 5), "x,y\ttab")]
    sch = "a long, b double, c timestamp, d string"
    df = spark.createDataFrame(rows, sch)
    p_csv, p_json = str(tmp_path / "c"), str(tmp_path / "j")
    IO.write_csv(df, p_csv)
    IO.write_json(df, p_json)
    for back in (IO.read_csv(spark, p_csv, df.schema), IO.read_json(spark, p_json, df.schema)):
        r = back.collect()[0]
        assert (r["a"], r["b"], r["c"], r["d"]) == rows[0]


def test_read_lines_xz_hadoop_text_semantics(spark):
    """The xz pass must match Hadoop LineRecordReader semantics so an
    .xz file yields the same rows its decompressed sibling would: CR,
    LF, and CRLF all terminate lines (no \\r tainting), and invalid
    UTF-8 bytes are tolerated instead of aborting the directory scan."""
    import lzma

    d = tempfile.mkdtemp(prefix="ts_xzsem_")
    payload = b"dos\r\nunix\nmac\rlast"
    with open(os.path.join(d, "x.xz"), "wb") as f:
        f.write(lzma.compress(payload))
    got = sorted(r["line"] for r in IO.read_lines(spark, d).collect())
    assert got == ["dos", "last", "mac", "unix"]
    # same rows as the Hadoop text path reading the raw sibling
    with open(os.path.join(d, "y.txt"), "wb") as f:
        f.write(payload)
    both = IO.read_lines(spark, d).groupBy("line").count().collect()
    assert all(r["count"] == 2 for r in both)
    # invalid UTF-8 inside an xz stream: scan survives, bad byte
    # becomes the replacement char
    d2 = tempfile.mkdtemp(prefix="ts_xzbad_")
    with open(os.path.join(d2, "bad.xz"), "wb") as f:
        f.write(lzma.compress(b"ok\nbad\xffbyte\n"))
    rows = sorted(r["line"] for r in IO.read_lines(spark, d2).collect())
    assert rows[1] == "ok" and rows[0] == "bad�byte"


def test_thrill_lines_writer_sweep_is_job_scoped(spark):
    """Two-phase-commit cleanup must not delete a CONCURRENT append
    writer's in-flight temp file: the stray sweep is scoped by a
    per-write job token (reference write_lines.hpp relies on unique
    per-worker paths for the same isolation)."""
    from thrill_spark.sources import linesource

    linesource.register(spark)
    d = tempfile.mkdtemp(prefix="ts_tok_") + "/out"
    os.makedirs(d, exist_ok=True)
    # simulate another job's in-flight temp (different job token)
    foreign = os.path.join(d, "._tmp-deadbeef-0123abc")
    with open(foreign, "wb") as f:
        f.write(b"other job, still writing\n")
    df = spark.range(10).select(F.concat(F.lit("v-"), F.col("id")).alias("line"))
    (
        df.write.format("thrill_lines")
        .option("path", d)
        .mode("append")
        .save()
    )
    # this job committed its parts AND left the foreign temp alone
    assert os.path.exists(foreign)
    names = sorted(os.listdir(d))
    parts = [f for f in names if f.startswith("part-")]
    assert parts
    own_tmps = [f for f in names if f.startswith("._tmp-") and f != os.path.basename(foreign)]
    assert own_tmps == []  # this job's temps all renamed or swept


def test_linesource_chunked_reader_boundaries(tmp_path):
    """The r12 chunked scan (megabyte reads + arithmetic offsets) must
    produce exactly the per-readline result for ANY chunk size / split
    count: no torn, lost, or duplicated lines at chunk or range
    boundaries, offsets identical to file positions."""
    from thrill_spark.sources.linesource import ByteRangeLinesReader

    lines = [f"line-{i:04d}" for i in range(500)]
    pth = tmp_path / "f.txt"
    pth.write_text("\n".join(lines) + "\n")
    offsets = []
    at = 0
    for ln in lines:
        offsets.append(at)
        at += len(ln) + 1
    for chunk in (1, 3, 16, 1 << 20):
        for n_splits in (1, 5, 64):
            r = ByteRangeLinesReader(
                {"path": str(pth), "n_splits": str(n_splits)}
            )
            r._CHUNK_BYTES = chunk
            r._BATCH_ROWS = 7
            got = []
            for part in r.partitions():
                for b in r.read(part):
                    got += list(
                        zip(b.column(1).to_pylist(), b.column(2).to_pylist())
                    )
            got.sort()
            assert [o for o, _ in got] == offsets, (chunk, n_splits)
            assert [l for _, l in got] == lines, (chunk, n_splits)


def test_linesource_unterminated_final_line(tmp_path):
    from thrill_spark.sources.linesource import ByteRangeLinesReader

    pth = tmp_path / "g.txt"
    pth.write_text("aa\nb")  # no trailing newline
    for chunk in (1, 2, 64):
        r = ByteRangeLinesReader({"path": str(pth), "n_splits": "3"})
        r._CHUNK_BYTES = chunk
        got = sorted(
            l
            for part in r.partitions()
            for b in r.read(part)
            for l in b.column(2).to_pylist()
        )
        assert got == ["aa", "b"], chunk


def test_linesource_crlf_matches_hadoop_semantics(tmp_path):
    """CR/LF/CRLF files must yield identical lines on the byte-range
    path and the Hadoop-codec fallback path (r12): all three are line
    terminators and never line content — verified against Hadoop's
    LineRecordReader behavior (spark.read.text yields a, b, c, plain
    for this byte sequence)."""
    from thrill_spark.sources.linesource import ByteRangeLinesReader

    pth = tmp_path / "crlf.txt"
    pth.write_bytes(b"a\r\nb\rc\r\nplain\n")
    for chunk in (1, 4, 64):
        r = ByteRangeLinesReader({"path": str(pth), "n_splits": "2"})
        r._CHUNK_BYTES = chunk
        got = [
            (o, l)
            for part in r.partitions()
            for b in r.read(part)
            for o, l in zip(b.column(1).to_pylist(), b.column(2).to_pylist())
        ]
        got.sort()
        assert got == [(0, "a"), (3, "b"), (5, "c"), (8, "plain")], chunk


def test_linesource_property_random_corpora(tmp_path):
    """Property check: for random line content (incl. \\r, unicode,
    empty lines, missing trailing newline), any (chunk, n_splits)
    combination reproduces the naive single-pass read exactly."""
    import os as _os

    from hypothesis import given, settings, strategies as st

    from thrill_spark.sources.linesource import ByteRangeLinesReader

    alphabet = st.sampled_from(list("ab \ré世"))
    lines_st = st.lists(st.text(alphabet=alphabet, max_size=12), max_size=20)

    counter = [0]

    @settings(max_examples=60, deadline=None)
    @given(lines=lines_st, trailing=st.booleans(),
           chunk=st.integers(1, 48), n_splits=st.integers(1, 9))
    def check(lines, trailing, chunk, n_splits):
        # generated "lines" may contain \r, so the naive reference
        # below re-derives the ACTUAL Hadoop-semantics line set (CR,
        # LF, CRLF all terminate) with byte offsets
        body = "\n".join(lines) + ("\n" if trailing and lines else "")
        counter[0] += 1
        pth = tmp_path / f"prop-{counter[0]}.txt"
        data = body.encode("utf-8")
        pth.write_bytes(data)
        want = []
        i, n = 0, len(data)
        while i < n:
            start = i
            while i < n and data[i] not in (13, 10):
                i += 1
            want.append((start, data[start:i].decode("utf-8")))
            if i < n:
                i += 2 if data[i] == 13 and i + 1 < n and data[i + 1] == 10 else 1
        r = ByteRangeLinesReader(
            {"path": str(pth), "n_splits": str(n_splits)}
        )
        r._CHUNK_BYTES = chunk
        r._BATCH_ROWS = 5
        got = sorted(
            (o, l)
            for part in r.partitions()
            for b in r.read(part)
            for o, l in zip(b.column(1).to_pylist(), b.column(2).to_pylist())
        )
        assert got == want
        _os.remove(pth)

    check()


def test_linesource_many_files_order(tmp_path):
    """200 files, deliberately non-lexicographic creation order and
    mixed plain/gz: file_idx follows SORTED path order and offsets
    reset per file."""
    import gzip
    import random

    from thrill_spark.sources.linesource import ByteRangeLinesReader

    rng = random.Random(7)
    names = [f"f{i:03d}" for i in range(200)]
    shuffled = names[:]
    rng.shuffle(shuffled)
    for i, nm in enumerate(shuffled):
        if i % 3 == 0:
            with gzip.open(tmp_path / f"{nm}.txt.gz", "wt") as f:
                f.write(f"{nm}-a\n{nm}-b\n")
        else:
            (tmp_path / f"{nm}.txt").write_text(f"{nm}-a\n{nm}-b\n")
    r = ByteRangeLinesReader({"path": str(tmp_path), "n_splits": "16"})
    rows = sorted(
        (b.column(0).to_pylist()[i], b.column(1).to_pylist()[i], b.column(2).to_pylist()[i])
        for part in r.partitions()
        for b in r.read(part)
        for i in range(b.num_rows)
    )
    # sorted file list interleaves .txt and .txt.gz lexicographically;
    # recompute the expectation the same way _expand defines it
    import os

    files = sorted(os.listdir(tmp_path))
    want = []
    for fi, fn in enumerate(files):
        stem = fn.split(".")[0]
        want += [(fi, 0, f"{stem}-a"), (fi, 7, f"{stem}-b")]
    assert rows == want
