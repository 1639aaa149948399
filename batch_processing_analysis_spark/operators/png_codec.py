"""Minimal pure-Python PNG codec (W3C PNG spec, second edition /
RFC 2083 — public format; zlib + struct are stdlib).

VERDICT r6 stretch 8: the container has no PIL/soundfile, so the
multimodal decode stage ran only as an import-gated skip. This module
makes the IMAGE half real without any dependency: :func:`decode_png`
handles the overwhelmingly common subset (8-bit depth, color types
0/2/4/6 — gray, RGB, gray+alpha, RGBA — non-interlaced, all five
filter types, multi-IDAT, CRC-checked) and :func:`encode_png` writes a
spec-valid RGB PNG so tests can round-trip without a codec either.
Palette (type 3), 16-bit, and Adam7 interlace raise ``ValueError``
naming the unsupported feature — real corpora route those through PIL
where available (operators/multimodal.py:decode_image tries PIL
first).

Decode cost is O(pixels) pure Python — fine for the test/CI images it
exists for; production-scale decode belongs to a native codec behind
the same ``decode_image`` swap point.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    pos = 8
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("corrupt PNG: truncated chunk header")
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("corrupt PNG: truncated chunk body")
        crc_bytes = data[pos + 8 + length:pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("corrupt PNG: truncated chunk CRC")
        crc = struct.unpack(">I", crc_bytes)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG byte string → ``(height, width, flat RGB bytes)``
    (row-major, 3 bytes per pixel; alpha is dropped and gray is
    replicated — the ``convert("RGB")`` convention of the PIL path)."""
    if data[:8] != MAGIC:
        raise ValueError("not a PNG: bad signature")
    ihdr = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("corrupt PNG: missing IHDR")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG: bit depth {depth} (only 8)")
    if ctype_v not in _CHANNELS:
        raise ValueError(f"unsupported PNG: color type {ctype_v} "
                         f"(palette PNGs need a real codec)")
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlace")
    if not idat:
        raise ValueError("corrupt PNG: no IDAT data")
    nch = _CHANNELS[ctype_v]
    stride = w * nch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("corrupt PNG: decompressed size mismatch")
    prev = bytearray(stride)
    out = bytearray(h * w * 3)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(nch, stride):
                row[i] = (row[i] + row[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - nch] if i >= nch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = row[i - nch] if i >= nch else 0
                ul = prev[i - nch] if i >= nch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"corrupt PNG: unknown filter type {ft}")
        base = y * w * 3
        if ctype_v == 2:  # RGB straight copy
            out[base:base + w * 3] = row
        else:
            for x in range(w):
                px = x * nch
                if ctype_v == 0 or ctype_v == 4:  # gray(+alpha)
                    g = row[px]
                    out[base + x * 3:base + x * 3 + 3] = bytes((g, g, g))
                else:  # RGBA: drop alpha
                    out[base + x * 3:base + x * 3 + 3] = row[px:px + 3]
        prev = row
    return h, w, bytes(out)


def encode_png(height: int, width: int, rgb: bytes) -> bytes:
    """Encode flat row-major RGB bytes as a spec-valid 8-bit truecolor
    PNG (filter type 0 every row — simple, always correct)."""
    if len(rgb) != height * width * 3:
        raise ValueError(f"rgb buffer is {len(rgb)} bytes, expected "
                         f"{height * width * 3}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))
