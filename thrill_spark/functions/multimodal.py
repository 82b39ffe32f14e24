"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature kernels are STUBS (the media libraries are not in
this container) — clearly marked below — but the Spark-side machinery
is real and tested: schema convention, Arrow-batched mapInPandas
signatures, partition sizing for large blobs, and a deterministic fake
decoder so pipelines are end-to-end runnable.

Schema convention for a media column `m`:
    m          binary        raw bytes (or NULL if externalized)
    m_meta     struct<format string, width int, height int,
                      n_frames int, sample_rate int>

At 100 TB scale the binary payload dominates: keep blobs in their own
parquet files (or external object store with a uri column), set
spark.sql.files.maxPartitionBytes so a partition holds a bounded number
of blobs, and never groupBy/shuffle the binary column itself — shuffle
the (id, feature) projections instead.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, fmt: str = "png") -> DataFrame:
    """Deterministic fake media: payload bytes derived from the id (so
    tests are reproducible without media libs)."""
    payload = F.encode(
        F.concat(F.lit(fmt + ":"), F.col(id_col).cast("string")), "utf-8"
    ).cast("binary")
    meta = F.struct(
        F.lit(fmt).alias("format"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def have_pil() -> bool:
    """True when Pillow is importable (optional dependency: absent in
    this container, present in a deployment image)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(raw: bytes) -> tuple[str, int, int]:
    """Real decode: Pillow when importable, else the vendored pure-Python
    PNG codec (thrill_spark/functions/pngcodec.py, stdlib zlib) for PNG
    payloads. Raises NotImplementedError only when neither path can
    decode the bytes (e.g. JPEG without Pillow).

    Returns (format, width, height)."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(raw))
        img.load()
        return (img.format or "unknown").lower(), img.width, img.height
    except ImportError:
        pass
    from thrill_spark.functions import pngcodec

    if pngcodec.is_png(raw):
        w, h, _ch, _px = pngcodec.decode_png(raw)
        return "png", w, h
    raise NotImplementedError(
        "non-PNG image decode requires Pillow/opencv; not available here"
    )


def decode_fake(raw: bytes) -> tuple[str, int]:
    """Deterministic fake 'decode': parses the attach_fake_media payload
    -> (format, id). Stands in for _decode_image_real in tests."""
    s = raw.decode("utf-8")
    fmt, _, ident = s.partition(":")
    return fmt, int(ident)


def _decode_image_pixels(raw: bytes) -> tuple[str, int, int, bytes]:
    """Real decode returning raw pixel bytes: Pillow when importable,
    else the vendored PNG codec. Raises on undecodable payloads."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(raw))
        img.load()
        return (img.format or "unknown").lower(), img.width, img.height, img.tobytes()
    except ImportError:
        pass
    from thrill_spark.functions import pngcodec

    w, h, _ch, px = pngcodec.decode_png(raw)
    return "png", w, h, bytes(px)


def attach_real_png_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Attach an ACTUAL PNG payload per row (vendored encoder, stdlib
    zlib): greyscale, width = id%32+1, height = id%24+1, pixel(x,y) =
    (x*7 + y*13 + id) % 256. Deterministic, so a SQL oracle can
    recompute every decoded property — this is how the real-decode
    kernel gets a hard correctness signal without media libs."""
    from thrill_spark.functions.pngcodec import encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ident in pdf["id"]:
                ident = int(ident)
                w, h = ident % 32 + 1, ident % 24 + 1
                px = bytes(
                    (x * 7 + y * 13 + ident) % 256 for y in range(h) for x in range(w)
                )
                blobs.append(encode_png(w, h, px, channels=1))
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    return df.select(F.col(id_col).alias("id")).mapInPandas(op, "id long, media binary")


DECODE_SCHEMA = "id long, format string, width int, height int, pix_sum long"


def decode_image_features(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Decode real image blobs -> (id, format, width, height, pix_sum).

    This is a REAL decode (full IDAT inflate + unfilter via the vendored
    codec, or Pillow when present), not metadata sniffing: pix_sum is the
    sum over decoded pixel bytes, which only a correct decode produces."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                fmt, w, h, px = _decode_image_pixels(bytes(raw))
                rows.append((int(ident), fmt, w, h, sum(px)))
            yield pd.DataFrame(
                rows, columns=["id", "format", "width", "height", "pix_sum"]
            )

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(op, DECODE_SCHEMA)


FEATURE_SCHEMA = "id long, format string, n_bytes int, feat_checksum long"


def extract_features(
    df: DataFrame, id_col: str = "id", use_real_decoder: bool | None = None
) -> DataFrame:
    """Feature extraction over media blobs via Arrow-batched mapInPandas.

    The batch iterator shape is the production pattern: per-batch decode
    keeps peak memory at (batch rows x blob size), and the output drops
    the binary payload so downstream shuffles move only features.

    use_real_decoder: True -> Pillow decode (raises if Pillow absent);
    False -> deterministic fake; None (default) -> Pillow when
    importable on the executors, fake otherwise.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = have_pil() if use_real_decoder is None else use_real_decoder
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                raw = bytes(raw)
                if real:
                    try:
                        fmt, _w, _h = _decode_image_real(raw)
                        parsed = int(ident)
                    except NotImplementedError:
                        raise  # explicitly requested real decode, no lib
                    except Exception:
                        # payload is not a real image (e.g. the fake
                        # corpus) — fall back per-row
                        fmt, parsed = decode_fake(raw)
                else:
                    fmt, parsed = decode_fake(raw)
                checksum = sum(raw) * 31 + parsed
                rows.append((ident, fmt, len(raw), checksum))
            yield pd.DataFrame(rows, columns=["id", "format", "n_bytes", "feat_checksum"])

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(op, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, id_col: str = "id") -> DataFrame:
    """Resize plumbing: passes blobs through mapInPandas and rewrites
    metadata; the pixel kernel is the stubbed decoder. Output schema
    keeps the binary column (resized payload in production)."""

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                {"format": decode_fake(bytes(r))[0], "width": width, "height": height,
                 "n_frames": 1, "sample_rate": None}
                for r in pdf["media"]
            ]
            yield pd.DataFrame(
                {"id": pdf[id_col], "media": pdf["media"], "media_meta": metas}
            )

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(op, out_schema)


def audio_chunks(df: DataFrame, chunk_ms: int, id_col: str = "id") -> DataFrame:
    """Audio waveform chunking plumbing: splits each clip into
    fixed-duration windows -> (id, chunk_idx, start_ms, end_ms,
    sample_rate). The decode step (real duration/rate from the codec
    header) is the stubbed kernel — here both derive deterministically
    from the id (duration_ms = 500 + id%20 * 250; rate = 8000 +
    id%3 * 4000) so the op is end-to-end runnable and oracle-checked.

    FlatMap-shaped mapInPandas like frame_sample: 0..n output rows per
    clip, binary payload dropped before any shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, rates = [], [], [], [], []
            for ident in pdf[id_col]:
                ident = int(ident)
                duration_ms = 500 + (ident % 20) * 250  # fake decode
                rate = 8000 + (ident % 3) * 4000
                n = -(-duration_ms // chunk_ms)
                for i in range(n):
                    ids.append(ident)
                    idxs.append(i)
                    starts.append(i * chunk_ms)
                    ends.append(min((i + 1) * chunk_ms, duration_ms))
                    rates.append(rate)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "chunk_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "sample_rate": rates,
                }
            )

    return df.select(F.col(id_col).alias(id_col)).mapInPandas(
        op, "id long, chunk_idx int, start_ms int, end_ms int, sample_rate int"
    )


def frame_sample(df: DataFrame, every_n: int, id_col: str = "id") -> DataFrame:
    """Video frame-sampling plumbing: emits 0..n rows per input row
    (frame index modulo), the FlatMap-shaped mapInPandas pattern."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for ident in pdf[id_col]:
                n_frames = int(ident) % 10 + 1  # fake: derived frame count
                for fr in range(0, n_frames, every_n):
                    ids.append(ident)
                    frames.append(fr)
            yield pd.DataFrame({"id": ids, "frame_idx": frames})

    return df.select(F.col(id_col).alias(id_col)).mapInPandas(op, "id long, frame_idx int")


RESIZE_REAL_SCHEMA = "id long, media binary, width int, height int, pix_sum long"


def resize_real_png(
    df: DataFrame, width: int, height: int, id_col: str = "id"
) -> DataFrame:
    """REAL image resize kernel: full PNG decode (IDAT inflate +
    unfilter via the vendored codec), nearest-neighbor resample,
    re-encode to PNG. No media libraries — and no stub: pix_sum is
    computed from the resampled pixel bytes, so only a correct
    decode->resample chain produces it.

    Arrow-batched mapInPandas; peak memory = batch rows x image size;
    the resized payload stays in the row (production shape)."""
    from thrill_spark.functions.pngcodec import decode_png, encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                w, h, ch, px = decode_png(bytes(raw))
                out = bytearray()
                for y in range(height):
                    sy = y * h // height
                    base = sy * w * ch
                    for x in range(width):
                        sx = x * w // width
                        out += px[base + sx * ch : base + sx * ch + ch]
                rows.append(
                    (
                        int(ident),
                        encode_png(width, height, bytes(out), channels=ch),
                        width,
                        height,
                        sum(out),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "media", "width", "height", "pix_sum"]
            )

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(
        op, RESIZE_REAL_SCHEMA
    )


def attach_real_wav_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Attach an ACTUAL 16-bit mono PCM WAV payload per row (stdlib
    `wave` writer): sample_rate 8000, n_samples = 100 + id%50,
    sample[i] = ((id*31 + i*17) % 2048) - 1024. Deterministic, so a
    SQL oracle recomputes every decoded property."""
    import io
    import struct
    import wave

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ident in pdf["id"]:
                ident = int(ident)
                n = 100 + ident % 50
                samples = [((ident * 31 + i * 17) % 2048) - 1024 for i in range(n)]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(struct.pack(f"<{n}h", *samples))
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    return df.select(F.col(id_col).alias("id")).mapInPandas(op, "id long, media binary")


WAV_SCHEMA = "id long, sample_rate int, n_samples int, energy long"


def decode_wav_features(df: DataFrame, id_col: str = "id") -> DataFrame:
    """REAL audio decode: parse the WAV container (stdlib `wave`),
    unpack the PCM frames (struct), emit sample_rate / n_samples /
    integer energy (sum of sample^2) — values only a correct decode of
    the frame bytes can produce."""
    import io
    import struct
    import wave

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                with wave.open(io.BytesIO(bytes(raw)), "rb") as wf:
                    sr = wf.getframerate()
                    n = wf.getnframes()
                    frames = wf.readframes(n)
                samples = struct.unpack(f"<{n}h", frames)
                rows.append((int(ident), sr, n, sum(s * s for s in samples)))
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "n_samples", "energy"]
            )

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(op, WAV_SCHEMA)


def phash_real_png(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded PNGs:
    full decode (IDAT inflate + unfilter), nearest-neighbor resample
    to a 9x8 grayscale grid, then 64 bits of horizontal gradient sign
    (bit = px[x+1] > px[x]) — the standard near-duplicate image
    fingerprint (identical content re-encoded with different PNG
    filters/compression hashes identically; small edits flip few
    bits, so Hamming distance ranks near-dups).

    Returned as a 64-char '0'/'1' string: exact grouping works
    directly, Hamming distance is a zip-count away, and the DuckDB
    oracle can rebuild it from the deterministic pixel formula without
    64-bit sign gymnastics. Arrow-batched mapInPandas over the media
    column; per-row work, no shuffle."""
    from thrill_spark.functions.pngcodec import decode_png

    def _lum(px: bytes, base: int, ch: int) -> int:
        # Grayscale: the sample itself. RGB(A): ITU-R BT.601 integer
        # luminance (299R + 587G + 114B) // 1000 — deterministic, no FP.
        if ch < 3:
            return px[base]
        return (299 * px[base] + 587 * px[base + 1] + 114 * px[base + 2]) // 1000

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                w, h, ch, px = decode_png(bytes(raw))
                grid = [
                    [
                        _lum(px, (y * h // 8) * w * ch + (x * w // 9) * ch, ch)
                        for x in range(9)
                    ]
                    for y in range(8)
                ]
                bits = "".join(
                    "1" if grid[y][x + 1] > grid[y][x] else "0"
                    for y in range(8)
                    for x in range(8)
                )
                rows.append((int(ident), w, h, bits))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "phash_bits"]
            )

    return df.select(F.col(id_col), "media").mapInPandas(
        op, f"{id_col} long, width int, height int, phash_bits string"
    )


WAV_FRAMES_SCHEMA = "id long, frame int, n_in_frame int, frame_energy long"


def wav_frame_energies(
    df: DataFrame, frame_samples: int = 32, id_col: str = "id"
) -> DataFrame:
    """Framed audio features over REAL decoded WAV payloads: the
    container is parsed with stdlib `wave`, 16-bit PCM unpacked, and
    per-frame energy (sum of squared samples) emitted per
    `frame_samples` window — the front half of any MFCC/VAD feature
    chain, with the Spark-side plumbing (schema, Arrow batching,
    per-frame row explosion) fully real. Deterministic synthetic PCM
    lets the oracle recompute every frame."""
    import io
    import struct
    import wave

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf["media"]):
                with wave.open(io.BytesIO(bytes(raw)), "rb") as wf:
                    n = wf.getnframes()
                    pcm = struct.unpack(f"<{n}h", wf.readframes(n))
                for f0 in range(0, n, frame_samples):
                    chunk = pcm[f0 : f0 + frame_samples]
                    rows.append(
                        (
                            int(ident),
                            f0 // frame_samples,
                            len(chunk),
                            sum(s * s for s in chunk),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["id", "frame", "n_in_frame", "frame_energy"]
            )

    return df.select(F.col(id_col).alias(id_col), "media").mapInPandas(
        op, WAV_FRAMES_SCHEMA
    )


def attach_real_wav_media_gated(df: DataFrame, id_col: str = "id") -> DataFrame:
    """attach_real_wav_media variant with PLANTED SILENCE: the sample
    stream is framed in 20-sample frames and frames with frame_idx % 5
    < 2 are all-zero (two silent frames then three voiced, repeating),
    sample rate 8000, n_samples = 100 + id%50, voiced sample[i] =
    ((id*31 + i*17) % 2048) - 1024. Deterministic, so the SQL oracle
    recomputes every decoded energy."""
    import io
    import struct
    import wave

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for ident in pdf["id"]:
                ident = int(ident)
                n = 100 + ident % 50
                samples = [
                    0
                    if ((i // 20) % 5) < 2
                    else ((ident * 31 + i * 17) % 2048) - 1024
                    for i in range(n)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(struct.pack(f"<{n}h", *samples))
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    return df.select(F.col(id_col).alias("id")).mapInPandas(op, "id long, media binary")


def silence_segments(
    energies: DataFrame,
    threshold: int = 0,
    id_col: str = "id",
) -> DataFrame:
    """Gaps-and-islands over frame energies: contiguous runs of frames
    with energy <= threshold become (id, start_frame, end_frame,
    n_frames) silence segments — the trim list an audio-curation
    pipeline feeds back into the cutter. One window + one groupBy,
    both partitioned by id: no global funnel."""
    from pyspark.sql import Window

    silent = energies.filter(F.col("frame_energy") <= threshold)
    w = Window.partitionBy(id_col).orderBy("frame")
    grp = silent.withColumn("_grp", F.col("frame") - F.row_number().over(w))
    return grp.groupBy(id_col, "_grp").agg(
        F.min("frame").alias("start_frame"),
        F.max("frame").alias("end_frame"),
        F.count("*").cast("long").alias("n_frames"),
    ).drop("_grp")
