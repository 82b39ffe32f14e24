"""Minimal pure-Python PNG codec (stdlib only: zlib + struct).

Implements the subset of the public PNG spec (RFC 2083 / W3C PNG) needed
to run a REAL image decode inside the multimodal pipeline in containers
without Pillow: 8-bit greyscale / RGB / RGBA, no interlacing, all five
scanline filters. This is the fallback kernel behind
multimodal._decode_image_real — Pillow is preferred when importable.

Not a general-purpose library: palette images, 16-bit channels, and
Adam7 interlacing raise ValueError (the caller treats that as
"undecodable here", same as a missing codec).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(raw: bytes) -> bool:
    return raw[:8] == PNG_MAGIC


def _chunks(raw: bytes):
    pos = 8
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(raw: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG -> (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, channels interleaved, fully unfiltered.
    Raises ValueError on non-PNG input or unsupported variants.
    """
    if not is_png(raw):
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, data in _chunks(raw):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    plain = zlib.decompress(bytes(idat))
    if len(plain) != height * (stride + 1):
        raise ValueError("corrupt IDAT length")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = plain[base]
        line = bytearray(plain[base + 1 : base + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, ch, out


def png_size(raw: bytes) -> tuple[int, int]:
    """Fast width/height from IHDR only (no IDAT inflate)."""
    if not is_png(raw):
        raise ValueError("not a PNG")
    for ctype, data in _chunks(raw):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            return w, h
        break
    raise ValueError("missing IHDR")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels (row-major, interleaved) as a valid PNG
    (filter 0 on every scanline). Used to generate real test images."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scan = bytearray()
    for y in range(height):
        scan.append(0)
        scan.extend(pixels[y * stride : (y + 1) * stride])
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + _chunk(b"IEND", b"")
    )
