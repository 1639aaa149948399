"""Full-matrix tests for the vendored PNG codec (VERDICT r8 "What's
missing #2": palette / sub-byte / 16-bit / Adam7 were loud gates;
this suite pins their decode paths via same-module roundtrip oracles
— encode_png_any writes spec-valid fixtures at every legal (color
type, depth, interlace) combo, so decode correctness reduces to exact
RGB equality against the input image)."""

from __future__ import annotations

import struct
import zlib

import pytest

from batch_processing_analysis_spark.operators import png_codec as P

VALID = [(ct, d) for ct, depths in P._VALID_DEPTHS.items() for d in depths]


def _gray_image(h, w, depth):
    """r==g==b pixels using every level representable at ``depth``."""
    if depth < 8:
        scale = 255 // ((1 << depth) - 1)
        levels = [i * scale for i in range(1 << depth)]
    else:
        levels = list(range(256))
    out = bytearray(h * w * 3)
    for y in range(h):
        for x in range(w):
            g = levels[(x * 3 + y * 7) % len(levels)]
            out[(y * w + x) * 3:(y * w + x) * 3 + 3] = bytes((g, g, g))
    return bytes(out)


def _color_image(h, w, ncolors=None):
    """Gradient truecolor image; with ``ncolors`` set, a repeating
    palette of exactly that many distinct colors."""
    if ncolors is not None:
        colors = [((i * 53 + 11) % 256, (i * 97 + 5) % 256,
                   (i * 31 + 77) % 256) for i in range(ncolors)]
        return bytes(v for y in range(h) for x in range(w)
                     for v in colors[(y * w + x) % ncolors])
    return bytes(((x * 37 + y * 11 + c * 3) % 256)
                 for y in range(h) for x in range(w) for c in range(3))


def _image_for(ctype, depth, h, w):
    if ctype in (0, 4):
        return _gray_image(h, w, depth)
    if ctype == 3:
        return _color_image(h, w, ncolors=1 << depth)
    return _color_image(h, w)


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("ctype,depth", VALID)
def test_full_matrix_roundtrip(ctype, depth, interlace):
    h, w = 5, 7  # odd dims exercise partial Adam7 passes + bit padding
    rgb = _image_for(ctype, depth, h, w)
    data = P.encode_png_any(h, w, rgb, depth=depth, color_type=ctype,
                            interlace=interlace)
    hh, ww, back = P.decode_png(data)
    assert (hh, ww) == (h, w)
    assert back == rgb, f"ctype={ctype} depth={depth} interlace={interlace}"


@pytest.mark.parametrize("h,w", [(1, 1), (1, 9), (9, 1), (2, 3), (8, 8),
                                 (9, 10), (16, 16)])
def test_adam7_sizes(h, w):
    # every size class of pass emptiness/partiality, truecolor 8-bit
    rgb = _color_image(h, w)
    _, _, back = P.decode_png(
        P.encode_png_any(h, w, rgb, interlace=1))
    assert back == rgb


def test_adam7_matches_sequential():
    rgb = _color_image(13, 11)
    _, _, seq = P.decode_png(P.encode_png(13, 11, rgb))
    _, _, adam = P.decode_png(P.encode_png_any(13, 11, rgb, interlace=1))
    assert adam == seq == rgb


def _hand_png(w, h, depth, ctype, raw, extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    parts = [P.MAGIC, P._chunk(b"IHDR", ihdr)]
    parts += [P._chunk(t, b) for t, b in extra_chunks]
    parts += [P._chunk(b"IDAT", zlib.compress(raw)), P._chunk(b"IEND", b"")]
    return b"".join(parts)


def test_16bit_filters_use_6_byte_bpp():
    # two-row 16-bit RGB (bpp=6): row 2 Sub-filtered against itself,
    # then the same pixels filter-0 — the decodes must agree. A bpp
    # bug (e.g. reusing the 8-bit bpp=3) would corrupt row 2.
    row1 = bytes(range(10, 34))  # 4 px * 3 ch * 2 bytes = 24
    row2 = bytes(range(100, 124))
    sub = bytearray(row2)
    for i in range(23, 5, -1):
        sub[i] = (row2[i] - row2[i - 6]) & 0xFF
    plain = _hand_png(4, 2, 16, 2, b"\x00" + row1 + b"\x00" + row2)
    filt = _hand_png(4, 2, 16, 2, b"\x00" + row1 + b"\x01" + bytes(sub))
    assert P.decode_png(filt) == P.decode_png(plain)
    # and the high-byte convention: pixel 0 of row 1 is (10, 12, 14)
    _, _, rgb = P.decode_png(plain)
    assert rgb[:3] == bytes((10, 12, 14))


def test_sub_byte_gray_scaling():
    # depth-2 gray: raw levels 0..3 scale to 0/85/170/255 exactly
    raw = b"\x00" + P._pack_row([0, 1, 2, 3], 2)
    _, _, rgb = P.decode_png(_hand_png(4, 1, 2, 0, raw))
    assert rgb == bytes(v for g in (0, 85, 170, 255) for v in (g, g, g))


def test_trns_parsed_and_dropped():
    rgb = _color_image(3, 4, ncolors=4)
    base = P.encode_png_any(3, 4, rgb, depth=2, color_type=3)
    # splice a tRNS chunk after PLTE: decode must equal the
    # no-tRNS decode (transparency dropped by the RGB convention)
    plte_at = base.index(b"PLTE") - 4
    plte_len = struct.unpack(">I", base[plte_at:plte_at + 4])[0]
    after_plte = plte_at + 12 + plte_len
    with_trns = (base[:after_plte] + P._chunk(b"tRNS", bytes([0, 128]))
                 + base[after_plte:])
    assert P.decode_png(with_trns) == P.decode_png(base)
    with pytest.raises(ValueError, match="tRNS longer than PLTE"):
        P.decode_png(base[:after_plte]
                     + P._chunk(b"tRNS", bytes(range(5)))
                     + base[after_plte:])


def test_palette_errors():
    # index 1 with a 1-color PLTE → out of range
    raw = b"\x00\x01"
    png = _hand_png(1, 1, 8, 3, raw,
                    extra_chunks=[(b"PLTE", bytes((9, 9, 9)))])
    with pytest.raises(ValueError, match="palette index out of range"):
        P.decode_png(png)
    with pytest.raises(ValueError, match="missing PLTE"):
        P.decode_png(_hand_png(1, 1, 8, 3, raw))
    with pytest.raises(ValueError, match="bad PLTE length"):
        P.decode_png(_hand_png(1, 1, 8, 3, raw,
                               extra_chunks=[(b"PLTE", bytes(4))]))


def test_invalid_header_combinations():
    raw = b"\x00\x00"
    with pytest.raises(ValueError, match="bit depth 4 is invalid"):
        P.decode_png(_hand_png(1, 1, 4, 2, raw))
    with pytest.raises(ValueError, match="invalid color type 5"):
        P.decode_png(_hand_png(1, 1, 8, 5, raw))
    with pytest.raises(ValueError, match="unknown interlace method"):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)
        P.decode_png(P.MAGIC + P._chunk(b"IHDR", ihdr)
                     + P._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                     + P._chunk(b"IEND", b""))


def test_encoder_constraint_errors():
    with pytest.raises(ValueError, match="r == g == b"):
        P.encode_png_any(1, 1, bytes((1, 2, 3)), color_type=0)
    with pytest.raises(ValueError, match="not representable"):
        P.encode_png_any(1, 1, bytes((7, 7, 7)), color_type=0, depth=1)
    with pytest.raises(ValueError, match="distinct colors"):
        P.encode_png_any(1, 4, _color_image(1, 4, ncolors=4),
                         color_type=3, depth=1)
    with pytest.raises(ValueError, match="bit depth 16 is invalid"):
        P.encode_png_any(1, 1, bytes(3), color_type=3, depth=16)


def test_interlaced_truncated_stream_is_loud():
    rgb = _color_image(9, 9)
    good = P.encode_png_any(9, 9, rgb, interlace=1)
    # re-compress the raw stream minus its last scanline
    idat_at = good.index(b"IDAT") - 4
    idat_len = struct.unpack(">I", good[idat_at:idat_at + 4])[0]
    raw = zlib.decompress(good[idat_at + 8:idat_at + 8 + idat_len])
    short = zlib.compress(raw[:-10])
    bad = (good[:idat_at] + P._chunk(b"IDAT", short)
           + good[idat_at + 12 + idat_len:])
    with pytest.raises(ValueError, match="size mismatch"):
        P.decode_png(bad)
