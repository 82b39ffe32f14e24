"""DIA-style fluent API: the reference's user-facing surface
(thrill/api/dia.hpp) re-expressed over DataFrames, so a Thrill program
ports method-for-method:

    ctx = ThrillContext(spark)
    ctx.Generate(100, lambda i: i * i).Filter(lambda v: v % 2 == 0).Sum()

Design:
- A DIA wraps a DataFrame with a value column ``v`` plus a stable
  ordering-key column ``_ord`` (array semantics: dia.hpp:127-141). LOps
  (Map/Filter/FlatMap) are Catalyst projections — fusion is free
  (whole-stage codegen plays the role of the reference's
  tlx::FunctionStack template fusion, dia.hpp:384-386).
- User functions are *column lambdas*: they receive pyspark Columns and
  return Column expressions, keeping the hot path JVM-side. (A Thrill
  C++ lambda would become a Python UDF — the slow path — so the port
  asks users to express row logic as expressions; structs map to
  struct columns.)
- Positional ops (Zip/ZipWithIndex/Window/PrefixSum/...) densify
  ``_ord`` into a 0-based ``_idx`` on demand via the two-phase
  ordering discipline in thrill_spark.ordering — the order key is
  data, never a physical partition assumption.
- Actions (Size/Sum/Min/Max/AllGather/...) trigger execution exactly
  like the reference's action nodes (dia.hpp:503-580).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from thrill_spark import ordering as O

V = "v"
ORD = "_ord"

ColFn = Callable[[Column], Column]


# Hadoop codec usability per extension, probed once per process: the
# factory resolves the class from the extension alone, so only an
# actual compressor construction proves the native library is loaded
# (ZStandardCodec resolves fine here but throws 'native zStandard
# library not available' at first use).
_HADOOP_CODEC_OK: dict[str, str | None] = {}


def _require_hadoop_codec(spark: SparkSession, sample_path: str) -> None:
    """Raise at PLAN time if the Hadoop codec for sample_path's
    extension is missing or its native backing library is not loaded,
    instead of letting every task fail mid-scan."""
    ext = os.path.splitext(sample_path)[1]
    if ext not in _HADOOP_CODEC_OK:
        err: str | None
        definitive = True
        try:
            jvm = spark._jvm
            factory = jvm.org.apache.hadoop.io.compress.CompressionCodecFactory(
                spark._jsc.hadoopConfiguration()
            )
            codec = factory.getCodec(jvm.org.apache.hadoop.fs.Path("probe" + ext))
            if codec is None:
                err = "no Hadoop codec registered for this extension"
            else:
                codec.createOutputStream(jvm.java.io.ByteArrayOutputStream())
                err = None
        except Exception as ex:  # noqa: BLE001 — py4j raises loosely
            # Py4JJavaError.__str__ appends the whole Java stack trace,
            # so classify on the FULL text (the last line is a '\tat'
            # frame) and report the message lines, not the trace.
            full = str(ex)
            msg_lines = [
                ln.strip()
                for ln in full.splitlines()
                if ln.strip() and not ln.strip().startswith("at ")
            ]
            err = " ".join(msg_lines[:2])[:200] or full[:200]
            # Only a missing-native-library failure is a property of
            # the runtime (Hadoop's wording: 'native <codec> library
            # not available' / '... was built without ... support');
            # any other exception (a transient py4j/JVM hiccup) must
            # not poison the cache for the process lifetime
            # (ADVICE r13). Require both words so a stray
            # 'org.apache.hadoop.io.nativeio' stack frame in a
            # transient error does not get cached as definitive.
            low = full.lower()
            definitive = "native" in low and "library" in low
        if err is None or definitive:
            _HADOOP_CODEC_OK[ext] = err
    else:
        err = _HADOOP_CODEC_OK[ext]
    if err is not None:
        raise ValueError(
            f"ReadLines: codec for {ext!r} is unavailable in this "
            f"runtime ({err}); re-encode as gz/bz2/xz or deploy the "
            "native Hadoop codec library."
        )


# A bz2 file larger than this multiple of the read's average split
# size is "oversized": one whole-stream partition would dominate the
# stage, so the read routes through Hadoop's splittable-bz2 scan.
_BZ2_AUTOSPLIT_FACTOR = 4


def _hadoop_split_lines(spark: SparkSession, files: list[str]) -> DataFrame:
    """Splittable-codec escape hatch: scan `files` with Spark's Hadoop
    text source (BZip2Codec block-splits large .bz2 members; plain and
    .gz members read as usual) and rebuild the DEFINED total order the
    byte-range source guarantees from file metadata:

      _ord = struct(file_idx, _blk, _seq)

    file_idx = position in the sorted path list (the ReadLines order
    contract), _blk = _metadata.file_block_start (the Hadoop split's
    byte offset — lines belong to the split they START in, so blocks
    partition each file's lines in stream order), _seq =
    monotonically_increasing_id (ascending within a split because ids
    are (partition << 33) | row; rows of one split are read
    sequentially). Sorting by this struct reproduces exact stream
    order per file and sorted-path order across files, with NO extra
    shuffle to build the key. Offsets are split-granular rather than
    byte-exact — the trade for intra-file bz2 parallelism."""
    from urllib.parse import quote

    # _metadata.file_path is URI-percent-encoded (probed on this
    # runtime: space -> %20, '%' -> %25, '+' stays raw — Java URI
    # path-component rules). Encode the Python-side keys the same way
    # (quote with the RFC 3986 path safe set) rather than url_decode
    # the metadata column: Java URLDecoder semantics would turn a
    # literal '+' into a space and silently drop that file's lines
    # (ADVICE r13). The join is a LEFT join from the lines side with a
    # runtime raise on any unmatched path, so an encoding mismatch can
    # never silently drop lines again.
    m = spark.createDataFrame(
        [
            (quote(os.path.abspath(f), safe="/!$&'()*+,;=:@"), i)
            for i, f in enumerate(files)
        ],
        "_fp string, file_idx int",
    )
    return (
        spark.read.text(files)
        .select(
            F.col("value").alias(V),
            # 'file:/abs' on this runtime; strip the scheme on the
            # metadata side, keep the percent-encoding.
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ).alias("_fp"),
            F.col("_metadata.file_block_start").alias("_blk"),
            F.monotonically_increasing_id().alias("_seq"),
        )
        .join(F.broadcast(m), "_fp", "left")
        .select(
            F.col(V),
            F.struct(
                F.when(
                    F.col("file_idx").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "ReadLines bz2 auto-route: metadata path "
                                "matched no input file (encoding drift): "
                            ),
                            F.col("_fp"),
                        )
                    ).cast("int"),
                )
                .otherwise(F.col("file_idx"))
                .alias("file_idx"),
                F.col("_blk"),
                F.col("_seq"),
            ).alias(ORD),
        )
    )


def _exprify(f: ColFn | Column) -> Column:
    return f(F.col(V)) if callable(f) else f


class ThrillContext:
    """api::Context analogue (thrill/api/context.hpp:62): the handle
    sources hang off. One per SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- sources (SURVEY §2.1) ------------------------------------------
    def Generate(self, size: int, f: ColFn | None = None) -> "DIA":
        """Generate(ctx, size, f) (thrill/api/generate.hpp:37)."""
        df = self.spark.range(size).select(
            (F.col("id") if f is None else f(F.col("id"))).alias(V),
            F.col("id").alias(ORD),
        )
        return DIA(df)

    def Distribute(self, values: Sequence[Any]) -> "DIA":
        """Distribute / EqualToDIA / ConcatToDIA
        (thrill/api/distribute.hpp:33, equal_to_dia.hpp:30)."""
        df = self.spark.createDataFrame(
            [(v, i) for i, v in enumerate(values)], [V, ORD]
        )
        return DIA(df)

    EqualToDIA = Distribute
    ConcatToDIA = Distribute

    # Extensions the byte-range DataSource cannot serve: codecs with
    # no Python-stdlib decoder (gz/bz2/xz ARE stdlib-decoded in the
    # source itself — see linesource._CODEC_EXTS). These need Hadoop's
    # codec factory; byte-splitting them raw yields garbage. '.zip' is
    # NOT here: Hadoop's factory has no zip codec, so falling back
    # would read raw archive bytes as UTF-8 lines — ReadLines raises
    # for it instead (ADVICE r12).
    _FALLBACK_EXTS = (".zst", ".lz4", ".snappy", ".deflate")
    _REJECT_EXTS = (".zip",)

    def ReadLines(self, path: str, n_splits: int | None = None) -> "DIA":
        """ReadLines (thrill/api/read_lines.hpp:41): order = file order.

        Local paths — plain or gz/bz2/xz-compressed (the codecs the
        reference's vfs filter layer recognizes,
        vfs/file_io.cpp:48-50) — are served by the byte-range Python
        DataSource (sources/linesource.py), whose (file_idx, offset)
        columns are a DEFINED total order — sorted path order, then
        (decompressed) byte offset — stable across any split count or
        multi-file glob. (A monotonically_increasing_id order key is
        file order only as an implementation accident: Spark packs
        text splits largest-first, so partition ids do not follow file
        offsets across splits.)

        Non-stdlib codec extensions and non-local URIs (s3a://,
        hdfs://) fall back to the Hadoop text reader via
        sources.io.read_lines: a remote path cannot be os.stat'd by
        the Python source. There the order key is per-file monotonic —
        codec streams are single-split per file, so this is still file
        order within each file. A LOCAL path mixing fallback-codec
        files with byte-range-servable ones raises instead of routing
        everything to the fallback: multi-split plain files would
        silently lose the defined order (Spark packs text splits
        largest-first), which is exactly the accident this source
        exists to prevent.

        Oversized-bz2 auto-route divergences (ADVICE r13): when any
        .bz2 file exceeds _BZ2_AUTOSPLIT_FACTOR x the read's average
        split size, the whole read is served by Hadoop's splittable
        bz2 scan instead of the byte-range source. On that route (a)
        an explicit n_splits is ADVISORY ONLY — Hadoop's split
        planner governs via spark.sql.files.maxPartitionBytes
        (honoring n_splits through the session conf would be unsafe:
        the returned DataFrame is lazy and file splits are planned at
        action time, so a scoped set/restore here would not cover the
        actual scan); and (b) the _ord schema is struct(file_idx,
        _blk, _seq) — split-granular stream order — instead of the
        byte-exact struct(file_idx, offset). Both orders sort to the
        same line sequence (io_bz2_autosplit_roundtrip proves it
        end-to-end)."""
        from thrill_spark.sources.linesource import (
            _expand,
            register,
            strip_file_uri,
        )

        p = str(path)
        remote = "://" in p and not p.startswith("file:")
        fallback = remote
        if not remote:
            files = _expand(strip_file_uri(p))
            bad = [f for f in files if f.endswith(self._REJECT_EXTS)]
            if bad:
                raise ValueError(
                    f"ReadLines: {p!r} matches {len(bad)} .zip file(s); "
                    "zip is an archive format with no Hadoop line "
                    "codec — extract it, or re-encode the members as "
                    "gz/bz2/xz (byte-range source) or lz4/snappy/"
                    "deflate (Hadoop fallback)."
                )
            fb = [f for f in files if f.endswith(self._FALLBACK_EXTS)]
            if fb and len(fb) < len(files):
                raise ValueError(
                    f"ReadLines: {p!r} mixes non-stdlib codec files "
                    f"({len(fb)} x {self._FALLBACK_EXTS}) with "
                    "byte-range-servable files; the defined "
                    "(file_idx, offset) order cannot cover both — "
                    "read the codec files with a separate ReadLines "
                    "call (per-file order) or re-encode them as "
                    "gz/bz2/xz."
                )
            if fb:
                # Plan-time codec availability check: Hadoop's factory
                # maps the extension to a codec class even when the
                # backing native library is absent (zstd in this
                # image), which would otherwise surface as an opaque
                # task-time failure mid-scan. One sample per DISTINCT
                # extension — a directory mixing .lz4 with .zst must
                # fail on the zst member, not pass on the lz4 one
                # (ADVICE r13).
                for ext in sorted({os.path.splitext(f)[1] for f in fb}):
                    _require_hadoop_codec(
                        self.spark, next(f for f in fb if f.endswith(ext))
                    )
            fallback = bool(fb)
        if fallback:
            from thrill_spark.sources.io import read_lines

            df = read_lines(self.spark, p).select(
                F.col("line").alias(V),
                F.monotonically_increasing_id().alias(ORD),
            )
            return DIA(df)

        n = n_splits or self.spark.sparkContext.defaultParallelism
        # Oversized-bz2 auto-route (VERDICT r12 #5): the byte-range
        # source reads each compressed file in ONE partition, so a
        # single giant bz2 would funnel through one task. bz2 is the
        # one stdlib codec Hadoop CAN block-split — when any bz2 file
        # would dominate the split plan, serve the whole read through
        # the Hadoop text scan instead, rebuilding the defined total
        # order from file metadata (see _hadoop_split_lines). xz has
        # no Hadoop codec, so a mix containing xz keeps the byte-range
        # path (per-file parallelism).
        if not any(f.endswith(".xz") for f in files):
            sizes = [os.path.getsize(f) for f in files]
            step = max(1, sum(sizes) // max(1, n))
            if any(
                f.endswith(".bz2") and sz > _BZ2_AUTOSPLIT_FACTOR * step
                for f, sz in zip(files, sizes)
            ):
                return DIA(_hadoop_split_lines(self.spark, files))

        register(self.spark)
        df = (
            self.spark.read.format("thrill_lines")
            .option("path", path)
            .option("n_splits", str(n))
            .load()
            .select(
                F.col("line").alias(V),
                F.struct("file_idx", "offset").alias(ORD),
            )
        )
        return DIA(df)

    def ReadBinary(self, path: str, order_col: str | None = None) -> "DIA":
        """ReadBinary (thrill/api/read_binary.hpp:45) — parquet-backed;
        rows become struct values. Pass order_col for a defined order."""
        raw = self.spark.read.parquet(path)
        ordc = F.col(order_col) if order_col else F.monotonically_increasing_id()
        df = raw.select(F.struct(*raw.columns).alias(V), ordc.alias(ORD))
        return DIA(df)


# Order-key densification cap: FlatMap/Sort/Concat each wrap the
# previous ``_ord`` in one more struct level, so an unboundedly deep
# Thrill-ported pipeline would drag an O(depth)-wide comparison key
# into every positional shuffle. Past this nesting depth the key is
# re-indexed to a flat long (one distributed with_index pass — the
# Collapse analogue for the order key), keeping key width O(1) in
# pipeline length. 4 keeps short chains free of extra shuffles.
_ORD_DENSIFY_DEPTH = 4


def _struct_depth(dt) -> int:
    from pyspark.sql.types import StructType

    if isinstance(dt, StructType):
        return 1 + max((_struct_depth(f.dataType) for f in dt.fields), default=0)
    return 0


def _align_ord(dias: "tuple[DIA, ...]") -> "tuple[DIA, ...]":
    """Union compatibility for positional ops: when inputs' ``_ord``
    key types differ (e.g. ReadLines' (file_idx, offset) struct vs
    Generate's long), the STRUCT-keyed inputs are densified to flat
    longs — unionByName cannot union heterogeneous struct columns
    (INCOMPATIBLE_COLUMN_TYPE). Already-flat keys are left untouched
    (numeric widening unions fine), so a Distribute/Generate side pays
    no re-index shuffle."""
    from pyspark.sql.types import StructType

    if len({d.df.schema[ORD].dataType.simpleString() for d in dias}) <= 1:
        return dias
    return tuple(
        DIA(
            O.with_index(d.df, [ORD]).select(
                V, F.col(O.IDX).cast("long").alias(ORD)
            )
        )
        if isinstance(d.df.schema[ORD].dataType, StructType)
        else d
        for d in dias
    )


class DIA:
    """DIA<T> analogue (thrill/api/dia.hpp:127-141): immutable, lazy,
    ordered. Wraps (v, _ord). The order key self-densifies past
    _ORD_DENSIFY_DEPTH struct nesting (see above) — that pass runs
    ordering jobs eagerly, the same trade Thrill's Collapse makes."""

    def __init__(self, df: DataFrame):
        if _struct_depth(df.schema[ORD].dataType) >= _ORD_DENSIFY_DEPTH:
            df = O.with_index(df, [ORD]).select(
                V, F.col(O.IDX).cast("long").alias(ORD)
            )
        self.df = df

    # -- LOps (§2.3) ----------------------------------------------------
    def Map(self, f: ColFn) -> "DIA":
        return DIA(self.df.select(_exprify(f).alias(V), ORD))

    def Filter(self, f: ColFn) -> "DIA":
        return DIA(self.df.filter(_exprify(f)))

    def FlatMap(self, f: ColFn) -> "DIA":
        """f returns an array Column; elements keep the parent's order
        position extended by the in-array offset."""
        exploded = self.df.select(
            F.posexplode(_exprify(f)).alias("_off", V), ORD
        )
        return DIA(
            exploded.select(V, F.struct(ORD, "_off").alias(ORD))
        )

    def BernoulliSample(self, p: float, seed: int | None = None) -> "DIA":
        return DIA(self.df.sample(fraction=p, seed=seed))

    def Union(self, *others: "DIA") -> "DIA":
        """Bag union, arbitrary order (thrill/api/union.hpp:53)."""
        dias = _align_ord((self, *others))
        out = dias[0].df
        for o in dias[1:]:
            out = out.unionByName(o.df)
        return DIA(out)

    # -- aggregations (§2.4) -------------------------------------------
    def ReduceByKey(self, key: ColFn, agg: Column) -> "DIA":
        """ReduceByKey (dia.hpp:900-1172). agg is an aggregate over v
        (e.g. F.sum('v')); output values are (key, agg) structs,
        unordered (the reference's reduce output order is also
        unspecified)."""
        out = (
            self.df.select(_exprify(key).alias("k"), V)
            .groupBy("k")
            .agg(agg.alias("a"))
            .select(F.struct("k", "a").alias(V), F.col("k").alias(ORD))
        )
        return DIA(out)

    def ReduceToIndex(self, key: ColFn, agg: Column, size: int, neutral: Any = None) -> "DIA":
        """ReduceToIndex (dia.hpp:1306-1450): dense [0,size) result."""
        agged = (
            self.df.select(_exprify(key).alias("k"), V).groupBy("k").agg(agg.alias("a"))
        )
        dense = (
            self.df.sparkSession.range(size)
            .withColumnRenamed("id", "k")
            .join(agged, on="k", how="left")
            .select(
                F.coalesce(F.col("a"), F.lit(neutral)).alias(V), F.col("k").alias(ORD)
            )
        )
        return DIA(dense)

    def GroupByKey(self, key: ColFn, fn, schema: str) -> "DIA":
        """GroupByKey (dia.hpp:1452-1571): fn sees all values of a key
        (pandas group iterator == GroupByIterator, applyInPandas)."""
        grouped = (
            self.df.select(_exprify(key).alias("k"), V)
            .groupBy("k")
            .applyInPandas(fn, schema)
        )
        first = grouped.columns[0]
        return DIA(
            grouped.select(F.struct(*grouped.columns).alias(V), F.col(first).alias(ORD))
        )

    def HyperLogLog(self, rsd: float = 0.05) -> int:
        return self.df.agg(F.approx_count_distinct(V, rsd).alias("c")).first()["c"]

    # -- sorts / order ops (§2.6) --------------------------------------
    def Sort(self, key: ColFn | None = None) -> "DIA":
        """Sort (thrill/api/sort.hpp:64). Stable by construction: the
        previous order key is the tiebreaker (SortStable)."""
        k = _exprify(key) if key else F.col(V)
        return DIA(
            self.df.select(V, F.struct(k.alias("k"), F.col(ORD).alias("t")).alias(ORD))
        )

    Sort_Stable = Sort

    def Merge(self, *others: "DIA", key: ColFn | None = None) -> "DIA":
        """Merge sorted DIAs (thrill/api/merge.hpp:44): union keeps the
        shared sort-key order."""
        return self.Union(*others) if key is None else self.Union(*others).Sort(key)

    def PrefixSum(self, exclusive: bool = False) -> "DIA":
        idf = O.prefix_sum(
            self.df, [ORD], F.col(V), name="_ps", exclusive=exclusive
        )
        return DIA(idf.select(F.col("_ps").alias(V), ORD))

    def ExPrefixSum(self) -> "DIA":
        return self.PrefixSum(exclusive=True)

    def Sample(self, k: int, seed: int = 42) -> "DIA":
        from thrill_spark.operators.basic import exact_sample

        return DIA(exact_sample(self.df, k, seed))

    def Rebalance(self, partitions: int | None = None) -> "DIA":
        n = partitions or self.df.sparkSession.sparkContext.defaultParallelism
        return DIA(self.df.repartition(n))

    def Concat(self, *others: "DIA") -> "DIA":
        """Order-preserving concat (thrill/api/concat.hpp:35): later
        inputs order after earlier ones.

        Mixed ``_ord`` key types densify via _align_ord first."""
        dias = _align_ord((self, *others))
        out = dias[0].df.select(
            V, F.struct(F.lit(0).alias("s"), F.col(ORD).alias("o")).alias(ORD)
        )
        for i, d in enumerate(dias[1:], start=1):
            out = out.unionByName(
                d.df.select(
                    V,
                    F.struct(F.lit(i).alias("s"), F.col(ORD).alias("o")).alias(ORD),
                )
            )
        return DIA(out)

    # -- zips / positional (§2.8) --------------------------------------
    def _indexed(self) -> DataFrame:
        return O.with_index(self.df, [ORD])

    def ZipWithIndex(self) -> "DIA":
        """ZipWithIndex (thrill/api/zip_with_index.hpp:30): v -> (v, i)."""
        idf = self._indexed()
        return DIA(
            idf.select(
                F.struct(F.col(V), F.col(O.IDX).alias("i")).alias(V),
                F.col(O.IDX).alias(ORD),
            )
        )

    def Zip(self, other: "DIA", f: Callable[[Column, Column], Column], how: str = "cut") -> "DIA":
        """Zip CutTag/PadTag (thrill/api/zip.hpp:426-652)."""
        a = self._indexed().select(F.col(O.IDX), F.col(V).alias("_va"))
        b = other._indexed().select(F.col(O.IDX), F.col(V).alias("_vb"))
        join_how = "inner" if how == "cut" else "full_outer"
        joined = a.join(b, on=O.IDX, how=join_how)
        return DIA(
            joined.select(
                f(F.col("_va"), F.col("_vb")).alias(V), F.col(O.IDX).alias(ORD)
            )
        )

    def Window(self, size: int, agg: Column, disjoint: bool = False) -> "DIA":
        """Window overlap/disjoint (thrill/api/window.hpp:142, :389).
        agg aggregates the struct column over the window frame."""
        if disjoint:
            # ordered=True: Thrill's window fn sees items in array order,
            # so order-sensitive aggs (collect_list) must be deterministic.
            out = O.disjoint_window(self.df, [ORD], size, {"_w": agg}, ordered=True)
            return DIA(out.select(F.col("_w").alias(V), F.col("window_id").alias(ORD)))
        out = O.sliding_window(self.df, [ORD], size, {"_w": agg})
        return DIA(out.select(F.col("_w").alias(V), F.col(O.IDX).alias(ORD)))

    def ZipWindow(
        self,
        other: "DIA",
        w_self: int,
        w_other: int,
        f: Callable[[Column, Column], Column],
    ) -> "DIA":
        """ZipWindow (thrill/api/zip_window.hpp:175,621-714): zip the
        i-th block of w_self consecutive items with the i-th block of
        w_other items from the other DIA. Blocks materialize as ordered
        arrays (idx div w bucketing + collect over in-block position)."""

        def blocks(d: "DIA", w: int, out: str) -> DataFrame:
            idf = d._indexed()
            return (
                idf.select(
                    (F.col(O.IDX) / w).cast("long").alias("_blk"),
                    F.struct(F.col(O.IDX).alias("p"), F.col(V).alias("x")).alias("_pv"),
                )
                .groupBy("_blk")
                .agg(F.array_sort(F.collect_list("_pv")).alias("_s"))
                .select("_blk", F.transform("_s", lambda s: s["x"]).alias(out))
            )

        a = blocks(self, w_self, "_wa")
        b = blocks(other, w_other, "_wb")
        joined = a.join(b, on="_blk", how="inner")  # CutTag semantics
        return DIA(
            joined.select(
                f(F.col("_wa"), F.col("_wb")).alias(V), F.col("_blk").alias(ORD)
            )
        )

    def FlatWindow(self, size: int, emit: Column, disjoint: bool = False) -> "DIA":
        """FlatWindow (dia.hpp:1925-1980): the window function emits
        0..n outputs — `emit` aggregates the frame into an ARRAY column
        which is exploded, ordered by (window position, offset)."""
        win = self.Window(size, emit, disjoint=disjoint)
        exploded = win.df.select(
            F.posexplode(F.col(V)).alias("_off", V), ORD
        )
        return DIA(exploded.select(V, F.struct(ORD, "_off").alias(ORD)))

    # -- joins (§2.5) ----------------------------------------------------
    def InnerJoin(
        self,
        other: "DIA",
        key_self: ColFn,
        key_other: ColFn,
        f: Callable[[Column, Column], Column],
    ) -> "DIA":
        """InnerJoin free function (thrill/api/inner_join.hpp:710,806):
        equi-join on extracted keys, join fn builds the output value.
        Output order is unspecified, matching the reference."""
        a = self.df.select(key_self(F.col(V)).alias("_k"), F.col(V).alias("_va"))
        b = other.df.select(key_other(F.col(V)).alias("_k"), F.col(V).alias("_vb"))
        joined = a.join(b, on="_k", how="inner")
        return DIA(
            joined.select(
                f(F.col("_va"), F.col("_vb")).alias(V),
                F.monotonically_increasing_id().alias(ORD),
            )
        )

    # -- actions (§2.10) ------------------------------------------------
    def Size(self) -> int:
        return self.df.count()

    def Sum(self, initial: Any = 0):
        r = self.df.agg(F.sum(V).alias("s")).first()["s"]
        return initial + (r if r is not None else 0)

    def Min(self):
        return self.df.agg(F.min(V).alias("m")).first()["m"]

    def Max(self):
        return self.df.agg(F.max(V).alias("m")).first()["m"]

    def AllReduce(self, agg: Column):
        return self.df.agg(agg.alias("r")).first()["r"]

    def Gather(self) -> list:
        return [r[V] for r in self.df.orderBy(ORD).select(V, ORD).collect()]

    AllGather = Gather

    def Execute(self) -> "DIA":
        self.df.count()
        return self

    def Print(self, n: int = 20) -> "DIA":
        self.df.orderBy(ORD).select(V).show(n, truncate=False)
        return self

    # -- plumbing (§2.11) ----------------------------------------------
    def Cache(self) -> "DIA":
        return DIA(self.df.cache())

    def Collapse(self) -> "DIA":
        """Collapse (thrill/api/collapse.hpp:29): cut lineage."""
        return DIA(self.df.localCheckpoint())

    def Keep(self) -> "DIA":
        return self  # consume-counting is Spark's GC concern

    def Dispose(self) -> "DIA":
        self.df.unpersist()
        return self

    # -- sinks (§2.2) ---------------------------------------------------
    def WriteLines(self, path: str) -> None:
        self.df.select(F.col(V).cast("string").alias("value")).write.mode(
            "overwrite"
        ).text(path)

    def WriteBinary(self, path: str) -> None:
        self.df.select(V, ORD).write.mode("overwrite").parquet(path)


def InnerJoin(
    a: DIA,
    b: DIA,
    key_a: ColFn,
    key_b: ColFn,
    f: Callable[[Column, Column], Column],
) -> DIA:
    """Module-level form matching the reference's free function
    api::InnerJoin(dia_a, dia_b, key_a, key_b, join_fn)
    (thrill/api/inner_join.hpp:710)."""
    return a.InnerJoin(b, key_a, key_b, f)
