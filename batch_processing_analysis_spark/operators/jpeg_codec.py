"""Minimal pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1,
public spec; tables from Annex K; stdlib + numpy only).

VERDICT r7 task 6: JPEG is the dominant real-world training-image
format, but the container has no PIL, so the decoded image path ran
only on PNG fixtures (operators/png_codec.py). This module makes the
JPEG half real without any dependency:

- :func:`decode_jpeg` handles sequential DCT (SOF0 baseline, plus the
  huffman extended-sequential SOF1, which decodes identically;
  interleaved or multi-scan non-interleaved) AND — r9, VERDICT r8
  task 6 — PROGRESSIVE DCT (SOF2: spectral selection, successive
  approximation with DC/AC refinement scans, cross-block EOB runs,
  per-scan restart markers; T.81 Annex G): 8-bit samples, grayscale
  or YCbCr with any sampling factors (4:4:4, 4:2:0, 4:2:2, ...),
  multiple DQT/DHT segments. Arithmetic coding (SOF9+), lossless,
  hierarchical, and 12-bit precision raise ``ValueError`` NAMING the
  feature — real corpora route those through PIL where available
  (operators/multimodal.py:decode_image tries PIL first).
- :func:`encode_jpeg` writes a spec-valid baseline JFIF file (Annex K
  quantization + huffman tables with IJG quality scaling, 4:4:4 or
  4:2:0, optional restart interval) so tests can round-trip without a
  codec either; :func:`encode_jpeg_progressive` writes the same
  quantized coefficients as a 10-scan SOF2 script, making
  decode(progressive) == decode(baseline) a bit-exact test oracle.

Decode cost is O(pixels) python for the entropy pass and vectorized
numpy for the IDCT — fine for the test/CI images it exists for;
production-scale decode belongs to a native codec behind the same
``decode_image`` swap point.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"\xff\xd8"

# Zigzag position -> raster index (T.81 Figure 5 / libjpeg
# jpeg_natural_order).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 / K.2 quantization tables (raster order).
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 huffman table specs: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_SOF_UNSUPPORTED = {
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: C @ f @ C.T equals T.81's FDCT
    (the 1/4 C(u)C(v) scaling folds into the orthonormal rows)."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _build_decode_table(bits: list[int],
                        vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical huffman (T.81 C.2): (code length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int],
                        vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), same canonical assignment."""
    return {v: (c, l) for (l, c), v in
            _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at (and exposes) marker bytes."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) \
                else None
            if nxt == 0x00:            # stuffed literal 0xFF
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "corrupt JPEG: restart marker inside entropy run")
            else:
                raise ValueError(
                    "corrupt JPEG: entropy data ended at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid huffman code")

    def align_to_marker(self) -> int:
        """Drop pad bits, consume one RSTn marker, return its index."""
        self.acc, self.nbits = 0, 0
        if not (self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("corrupt JPEG: expected restart marker")
        m = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return m


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to a signed value."""
    return v - (1 << t) + 1 if t > 0 and v < (1 << (t - 1)) else v


def _seq_block(reader: _BitReader, coef: np.ndarray, dc_tbl: dict,
               ac_tbl: dict, preds: list[int], ci: int) -> None:
    """Sequential (baseline) block decode: DC diff + full AC band
    (T.81 F.2.2)."""
    t = reader.decode_symbol(dc_tbl)
    preds[ci] += _extend(reader.receive(t), t)
    coef[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:     # ZRL
                k += 16
                continue
            break           # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        coef[ZIGZAG[k]] = _extend(reader.receive(s), s)
        k += 1


def _prog_dc_first(reader: _BitReader, coef: np.ndarray, dc_tbl: dict,
                   preds: list[int], ci: int, al: int) -> None:
    """Progressive DC, first scan (T.81 G.1.2.1): the usual DC diff
    over point-transformed values, stored shifted up by Al."""
    t = reader.decode_symbol(dc_tbl)
    preds[ci] += _extend(reader.receive(t), t)
    coef[0] = preds[ci] << al


def _prog_dc_refine(reader: _BitReader, coef: np.ndarray,
                    al: int) -> None:
    """Progressive DC refinement: one bit per block ORed into bit Al
    (works on negative two's-complement values identically)."""
    if reader.read_bit():
        coef[0] |= 1 << al


def _prog_ac_first(reader: _BitReader, coef: np.ndarray, ac_tbl: dict,
                   ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC, first scan of a band (T.81 G.1.2.2): EOB runs
    span blocks; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:     # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC run past band end")
        coef[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader: _BitReader, coef: np.ndarray, ac_tbl: dict,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement (T.81 G.1.2.3): correction bits for
    history-nonzero coefficients, new ±1<<Al coefficients at
    zero-history positions, EOB runs with corrections through the
    band tail; returns the remaining EOB run."""
    p1, m1 = 1 << al, -1 << al

    def correct(z: int) -> None:
        if reader.read_bit() and not (coef[z] & p1):
            coef[z] += p1 if coef[z] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    # Full run INCLUDING this block — the shared tail
                    # below takes this block's slot (libjpeg
                    # convention; _prog_ac_first's early-return form
                    # uses the run-minus-one convention instead).
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                newval = 0       # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: AC refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(data: bytes, data_pos: int, comps: list, sel: list,
                 blocks: list[np.ndarray], huff_dc: dict, huff_ac: dict,
                 progressive: bool, ss: int, se: int, ah: int, al: int,
                 restart_interval: int, h: int, w: int) -> int:
    """Decode one scan's entropy-coded data into ``blocks`` and return
    the position of the next real marker. Handles the two scan
    geometries (T.81 A.2): interleaved (MCU = one sampling cluster per
    component) and non-interleaved (MCU = one block of the single
    selected component, over the component's OWN ceil(size/8) grid,
    not the MCU-padded grid). Restart markers reset DC predictors and
    the EOB run."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    reader = _BitReader(data, data_pos)
    preds = [0] * len(comps)
    expected_rst = 0
    eobrun = 0
    if progressive and ss > 0 and len(sel) != 1:
        raise ValueError(
            "corrupt JPEG: progressive AC scans must be "
            "non-interleaved (T.81 G.1)")

    def units():
        if len(sel) > 1:
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for mcu in range(mcus_x * mcus_y):
                my, mx = divmod(mcu, mcus_x)
                out = []
                for ci, td, ta in sel:
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            out.append((ci, td, ta,
                                        blocks[ci][my * vs + by,
                                                   mx * hs + bx]))
                yield out
        else:
            ci, td, ta = sel[0]
            _, hs, vs, _ = comps[ci]
            cw = -(-(w * hs) // hmax)      # component pixel dims
            ch = -(-(h * vs) // vmax)
            wb, hb = -(-cw // 8), -(-ch // 8)
            for i in range(wb * hb):
                by, bx = divmod(i, wb)
                yield [(ci, td, ta, blocks[ci][by, bx])]

    for i, unit in enumerate(units()):
        if restart_interval and i and i % restart_interval == 0:
            m = reader.align_to_marker()
            if m != expected_rst:
                raise ValueError(
                    "corrupt JPEG: restart marker out of sequence")
            expected_rst = (expected_rst + 1) % 8
            preds = [0] * len(comps)
            eobrun = 0
        for ci, td, ta, coef in unit:
            if not progressive:
                _seq_block(reader, coef, huff_dc[td], huff_ac[ta],
                           preds, ci)
            elif ss == 0 and ah == 0:
                _prog_dc_first(reader, coef, huff_dc[td], preds, ci, al)
            elif ss == 0:
                _prog_dc_refine(reader, coef, al)
            elif ah == 0:
                eobrun = _prog_ac_first(reader, coef, huff_ac[ta],
                                        ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(reader, coef, huff_ac[ta],
                                         ss, se, al, eobrun)
    # Skip pad bits / stuffing / stray RSTs up to the next real marker.
    pos = reader.pos
    while pos + 1 < len(data):
        if (data[pos] == 0xFF and data[pos + 1] != 0x00
                and not 0xD0 <= data[pos + 1] <= 0xD7):
            break
        pos += 1
    return pos


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a JPEG byte string → ``(height, width, flat RGB bytes)``
    (row-major, 3 bytes/pixel; grayscale replicates — the
    ``convert("RGB")`` convention shared with :func:`png_codec.
    decode_png`). Handles baseline/extended sequential huffman (SOF0/
    SOF1, interleaved or multi-scan non-interleaved) AND progressive
    (SOF2: spectral selection + successive approximation, DC and AC
    refinement scans, EOB runs, restart markers — T.81 Annex G).
    Remaining unsupported T.81 modes (lossless, arithmetic,
    hierarchical, 12-bit) fail loudly by name."""
    if data[:2] != MAGIC:
        raise ValueError("not a JPEG: bad SOI marker")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None          # (h, w, comps=[(cid, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    blocks: list[np.ndarray] = []
    saw_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:           # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("corrupt JPEG: truncated segment")
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(
                f"unsupported JPEG mode: {_SOF_UNSUPPORTED[marker]} — "
                f"sequential/progressive huffman only (pip install "
                f"Pillow to decode every JPEG mode)")
        if marker in (0xC0, 0xC1, 0xC2):   # SOF0/SOF1/SOF2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(
                    f"unsupported JPEG precision {prec}-bit (8-bit "
                    f"only; pip install Pillow)")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            blocks = [np.zeros((mcus_y * vs, mcus_x * hs, 64),
                               dtype=np.int32)
                      for _, hs, vs, _ in comps]
        elif marker == 0xDB:         # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p:p + 64],
                                        dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(body[p:p + 128],
                                        dtype=">u2").astype(np.int32)
                    p += 128
                raster = np.zeros(64, dtype=np.int32)
                raster[ZIGZAG] = tbl
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:         # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise ValueError("corrupt JPEG: truncated DHT")
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xDD:         # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:         # SOS — decode this scan in place
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            h, w, comps = frame
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tda = body[1 + 2 * i:3 + 2 * i]
                idx = next(j for j, c in enumerate(comps)
                           if c[0] == cs)
                sel.append((idx, tda >> 4, tda & 0xF))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                data, pos + 2 + seg_len, comps, sel, blocks,
                huff_dc, huff_ac, progressive, ss, se, ah, al,
                restart_interval, h, w)
            saw_scan = True
            continue
        pos += 2 + seg_len
    if frame is None or not saw_scan:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # Dequantize + batched IDCT per component, then upsample/crop.
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        bl = blocks[ci].reshape(-1, 8, 8).astype(np.float64)
        bl *= qt[tq][None, :, :]
        pix = np.einsum("ux,nuv,vy->nxy", _C, bl, _C) + 128.0
        by, bx = blocks[ci].shape[:2]
        plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    out = np.clip(np.rint(np.stack(planes, axis=-1)), 0, 255) \
        .astype(np.uint8)
    if out.shape[-1] == 1:
        rgb = np.repeat(out, 3, axis=-1)
    elif out.shape[-1] == 3:
        y = out[..., 0].astype(np.float64)
        cb = out[..., 1].astype(np.float64) - 128.0
        cr = out[..., 2].astype(np.float64) - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
        rgb = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    else:
        raise ValueError(
            f"unsupported JPEG component count {out.shape[-1]} "
            f"(grayscale or YCbCr only; pip install Pillow)")
    return h, w, rgb.tobytes()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _scaled_qt(base: list[int], quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table (raster)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _encode_block(wr: _BitWriter, coef_z: np.ndarray, pred: int,
                  dc_tbl: dict, ac_tbl: dict) -> int:
    """Huffman-encode one zigzag-ordered quantized block; returns the
    new DC predictor."""
    dc = int(coef_z[0])
    diff = dc - pred
    mag, t = abs(diff), 0
    while mag:
        mag >>= 1
        t += 1
    code, length = dc_tbl[t]
    wr.write(code, length)
    if t:
        wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(coef_z)[0])) if coef_z.any() else 0
    for k in range(1, 64):
        v = int(coef_z[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_tbl[0x00]     # EOB
                wr.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_tbl[0xF0]     # ZRL
                wr.write(code, length)
                run = 0
            continue
        mag, s = abs(v), 0
        while mag:
            mag >>= 1
            s += 1
        code, length = ac_tbl[(run << 4) | s]
        wr.write(code, length)
        wr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _to_zigzag(qz_raster: np.ndarray) -> np.ndarray:
    """Reorder raster-order 64-vectors into zigzag scan order:
    zig[k] = raster[ZIGZAG[k]]."""
    return qz_raster[..., np.asarray(ZIGZAG)]


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mult
    pw = (-ww) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(int(q[z]) for z in ZIGZAG))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _rgb_to_quantized(height: int, width: int, rgb: bytes, quality: int,
                      subsampling: str
                      ) -> tuple[list[np.ndarray], np.ndarray,
                                 np.ndarray, int, int]:
    """Shared encoder front half: RGB → YCbCr → (optionally
    subsampled) planes → zigzag-ordered quantized blocks per
    component. Returns ``(qz, q_luma, q_chroma, hs, vs)`` — the
    baseline and progressive encoders differ only in how they
    entropy-code these identical coefficients (which is what makes
    decode(progressive) == decode(baseline) bit-exact, the roundtrip
    oracle in tests/test_jpeg_codec.py)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(
            f"unsupported subsampling {subsampling!r} (4:4:4 or 4:2:0)")
    img = np.frombuffer(rgb, dtype=np.uint8)
    if img.size != height * width * 3:
        raise ValueError("rgb length != height*width*3")
    img = img.reshape(height, width, 3).astype(np.float64)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    q_l = _scaled_qt(QT_LUMA, quality)
    q_c = _scaled_qt(QT_CHROMA, quality)
    if subsampling == "4:4:4":
        hs, vs = 1, 1
        planes = [_pad_to(yy, 8), _pad_to(cb, 8), _pad_to(cr, 8)]
    else:
        hs, vs = 2, 2
        yp = _pad_to(yy, 16)
        # 2x2 box average, then pad chroma to 8
        cbp = _pad_to(cb, 2)
        crp = _pad_to(cr, 2)
        cb_d = cbp.reshape(cbp.shape[0] // 2, 2,
                           cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr_d = crp.reshape(crp.shape[0] // 2, 2,
                           crp.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [yp, _pad_to(cb_d, 8), _pad_to(cr_d, 8)]
        # luma plane must cover the chroma-padded extent
        need_h, need_w = planes[1].shape[0] * 2, planes[1].shape[1] * 2
        if planes[0].shape != (need_h, need_w):
            planes[0] = np.pad(
                planes[0],
                ((0, need_h - planes[0].shape[0]),
                 (0, need_w - planes[0].shape[1])), mode="edge")

    qz = [
        _to_zigzag(_raster_blocks(planes[0], q_l)),
        _to_zigzag(_raster_blocks(planes[1], q_c)),
        _to_zigzag(_raster_blocks(planes[2], q_c)),
    ]
    return qz, q_l, q_c, hs, vs


def encode_jpeg(height: int, width: int, rgb: bytes, quality: int = 90,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Encode flat RGB bytes as a baseline JFIF JPEG (Annex K tables
    scaled by ``quality``, interleaved single scan, 4:4:4 or 4:2:0,
    optional DRI restart markers)."""
    qz, q_l, q_c, hs, vs = _rgb_to_quantized(height, width, rgb,
                                             quality, subsampling)

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wr = _BitWriter()
    preds = [0, 0, 0]
    mcus_y, mcus_x = qz[1].shape[0], qz[1].shape[1]
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
        my, mx = divmod(mcu, mcus_x)
        for by in range(vs):
            for bx in range(hs):
                preds[0] = _encode_block(
                    wr, qz[0][my * vs + by, mx * hs + bx], preds[0],
                    dc_l, ac_l)
        preds[1] = _encode_block(wr, qz[1][my, mx], preds[1], dc_c, ac_c)
        preds[2] = _encode_block(wr, qz[2][my, mx], preds[2], dc_c, ac_c)
    wr.flush()

    sof = _seg(0xC0, struct.pack(">BHHB", 8, height, width, 3)
               + bytes([1, (hs << 4) | vs, 0])
               + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
                + b"\x00\x00")
    out = MAGIC + app0 + _dqt_seg(0, q_l) + _dqt_seg(1, q_c)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += (_dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
            + _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
            + _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            + _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
            + sof + sos + bytes(wr.out) + b"\xff\xd9")
    return out


def _raster_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize an (H, W) plane (multiples of 8) →
    (blocks_y, blocks_x, 64) RASTER-ordered ints."""
    hh, ww = plane.shape
    f = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) \
        .astype(np.float64) - 128.0
    coefs = np.einsum("ux,nmxy,vy->nmuv", _C, f, _C)
    qz = np.rint(coefs / q.reshape(8, 8)[None, None])
    return qz.astype(np.int32).reshape(hh // 8, ww // 8, 64)


def encode_jpeg_gray(height: int, width: int, gray: bytes,
                     quality: int = 90) -> bytes:
    """Encode flat 8-bit grayscale bytes as a 1-component baseline
    JFIF JPEG — exists chiefly so the decoder's grayscale path has a
    dependency-free fixture generator."""
    img = np.frombuffer(gray, dtype=np.uint8)
    if img.size != height * width:
        raise ValueError("gray length != height*width")
    plane = _pad_to(img.reshape(height, width).astype(np.float64), 8)
    q_l = _scaled_qt(QT_LUMA, quality)
    qz = _to_zigzag(_raster_blocks(plane, q_l))
    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    wr = _BitWriter()
    pred = 0
    for my in range(qz.shape[0]):
        for mx in range(qz.shape[1]):
            pred = _encode_block(wr, qz[my, mx], pred, dc_l, ac_l)
    wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + b"\x00\x00")
    dqt = seg(0xDB, bytes([0]) + bytes(int(q_l[z]) for z in ZIGZAG))
    dht = (seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
               + bytes(DC_LUMA_VALS))
           + seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
                 + bytes(AC_LUMA_VALS)))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
              + bytes([1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return MAGIC + app0 + dqt + dht + sof + sos + bytes(wr.out) \
        + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G) — exists so the progressive
# DECODER has a dependency-free fixture generator whose pixel output
# must equal the baseline pipeline's bit-for-bit (same quantized
# coefficients, different entropy structuring).
# ---------------------------------------------------------------------------

# One universal huffman table for every progressive scan: all 256
# symbols, 254 at length 8 + 2 at length 9 (Kraft 0.996 < 1, canonical
# per T.81 C.2). The Annex K sequential AC tables lack the EOBn
# symbols (r<<4 for r >= 1) progressive EOB runs need; a fixture
# encoder optimizes for coverage, not compression.
PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0]
PROG_VALS = list(range(256))

# The scan script: spectral selection AND successive approximation on
# every component, so a decode exercises DC first/refine, AC
# first/refine, banded scans, and cross-block EOB runs.
_PROG_SCANS = [
    ("dc_first", None, 0, 0, 0, 1),
    ("ac_first", 0, 1, 5, 0, 2),
    ("ac_first", 1, 1, 63, 0, 1),
    ("ac_first", 2, 1, 63, 0, 1),
    ("ac_first", 0, 6, 63, 0, 2),
    ("ac_refine", 0, 1, 63, 2, 1),
    ("dc_refine", None, 0, 0, 1, 0),
    ("ac_refine", 0, 1, 63, 1, 0),
    ("ac_refine", 1, 1, 63, 1, 0),
    ("ac_refine", 2, 1, 63, 1, 0),
]


def encode_jpeg_progressive(height: int, width: int, rgb: bytes,
                            quality: int = 90,
                            subsampling: str = "4:4:4",
                            restart_interval: int = 0) -> bytes:
    """Encode flat RGB bytes as a PROGRESSIVE JFIF JPEG (SOF2): the
    same quantized coefficients as :func:`encode_jpeg`, entropy-coded
    as the 10-scan spectral-selection + successive-approximation
    script above. ``decode_jpeg(encode_jpeg_progressive(img)) ==
    decode_jpeg(encode_jpeg(img))`` bit-for-bit — the test oracle.
    ``restart_interval`` (in MCUs of each scan) emits RSTn markers in
    every scan, pinning the progressive restart paths too."""
    qz, q_l, q_c, hs, vs = _rgb_to_quantized(height, width, rgb,
                                             quality, subsampling)
    tbl = _build_encode_table(PROG_BITS, PROG_VALS)
    samp = [(hs, vs), (1, 1), (1, 1)]
    mcus_y, mcus_x = qz[1].shape[0], qz[1].shape[1]

    def comp_blocks(ci: int):
        """Non-interleaved block order over the component's OWN
        ceil(size/8) grid (T.81 A.2.2)."""
        csh, csv = samp[ci]
        cw = -(-(width * csh) // hs)
        ch = -(-(height * csv) // vs)
        wb, hb = -(-cw // 8), -(-ch // 8)
        for i in range(wb * hb):
            by, bx = divmod(i, wb)
            yield qz[ci][by, bx]

    class _ScanWriter:
        """Bit writer + EOB-run / correction-bit buffering + restart
        emission shared by the four scan kinds. Two DISTINCT bit
        buffers (the subtlety of G.1.2.3): ``br`` holds the CURRENT
        block's pending correction bits, emitted right after the next
        in-block symbol (the decoder reads them while walking the
        symbol's zero-history run); ``be`` holds correction bits of
        blocks that joined the EOB run, emitted right after the EOBn
        symbol (the decoder reads them in those blocks' tail walks)."""

        def __init__(self) -> None:
            self.wr = _BitWriter()
            self.eobrun = 0
            self.br: list[int] = []
            self.be: list[int] = []
            self.rst = 0
            self.n_units = 0

        def sym(self, s: int) -> None:
            code, length = tbl[s]
            self.wr.write(code, length)

        def emit_br(self) -> None:
            for b in self.br:
                self.wr.write(b, 1)
            self.br = []

        def flush_eobrun(self) -> None:
            if self.eobrun > 0:
                rr = self.eobrun.bit_length() - 1
                self.sym(rr << 4)
                if rr:
                    self.wr.write(self.eobrun - (1 << rr), rr)
                self.eobrun = 0
            for b in self.be:
                self.wr.write(b, 1)
            self.be = []

        def unit_boundary(self) -> None:
            """Call BEFORE each MCU/block: emits RSTn on interval."""
            if (restart_interval and self.n_units
                    and self.n_units % restart_interval == 0):
                self.flush_eobrun()
                self.wr.flush()
                self.wr.out += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) % 8
                self.reset_state()
            self.n_units += 1

        def reset_state(self) -> None:
            pass  # per-kind hooks assign over it

        def finish(self) -> bytes:
            self.flush_eobrun()
            self.wr.flush()
            return bytes(self.wr.out)

    def dc_first(al: int) -> bytes:
        sw = _ScanWriter()
        preds = [0, 0, 0]
        sw.reset_state = lambda: preds.__setitem__(
            slice(None), [0, 0, 0])
        for mcu in range(mcus_x * mcus_y):
            sw.unit_boundary()
            my, mx = divmod(mcu, mcus_x)
            for ci in range(3):
                csh, csv = samp[ci]
                for by in range(csv):
                    for bx in range(csh):
                        v = int(qz[ci][my * csv + by,
                                       mx * csh + bx][0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = abs(diff).bit_length()
                        sw.sym(t)
                        if t:
                            sw.wr.write(
                                diff if diff >= 0
                                else diff + (1 << t) - 1, t)
        return sw.finish()

    def dc_refine(al: int) -> bytes:
        sw = _ScanWriter()
        for mcu in range(mcus_x * mcus_y):
            sw.unit_boundary()
            my, mx = divmod(mcu, mcus_x)
            for ci in range(3):
                csh, csv = samp[ci]
                for by in range(csv):
                    for bx in range(csh):
                        v = int(qz[ci][my * csv + by,
                                       mx * csh + bx][0])
                        sw.wr.write((v >> al) & 1, 1)
        return sw.finish()

    def ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        sw = _ScanWriter()
        for block in comp_blocks(ci):
            sw.unit_boundary()
            r = 0
            for k in range(ss, se + 1):
                v = int(block[k])
                t = abs(v) >> al        # AC point transform: toward 0
                if t == 0:
                    r += 1
                    continue
                sw.flush_eobrun()
                while r > 15:
                    sw.sym(0xF0)        # ZRL
                    r -= 16
                s = t.bit_length()
                sw.sym((r << 4) | s)
                v2 = t if v >= 0 else -t
                sw.wr.write(v2 if v2 >= 0 else v2 + (1 << s) - 1, s)
                r = 0
            if r > 0:
                sw.eobrun += 1
                if sw.eobrun == 0x7FFF:
                    sw.flush_eobrun()
        return sw.finish()

    def ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        sw = _ScanWriter()
        for block in comp_blocks(ci):
            sw.unit_boundary()
            absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    sw.flush_eobrun()
                    sw.sym(0xF0)
                    r -= 16
                    sw.emit_br()
                if t > 1:               # history-nonzero: correction
                    sw.br.append(t & 1)
                    continue
                sw.flush_eobrun()       # newly significant
                sw.sym((r << 4) | 1)
                sw.wr.write(1 if int(block[ss + i]) >= 0 else 0, 1)
                sw.emit_br()
                r = 0
            if r > 0 or sw.br:
                sw.eobrun += 1
                sw.be += sw.br
                sw.br = []
                if sw.eobrun == 0x7FFF:
                    sw.flush_eobrun()
        return sw.finish()

    out = MAGIC + _seg(0xE0, b"JFIF\x00\x01\x01\x00"
                       + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _dqt_seg(0, q_l) + _dqt_seg(1, q_c)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _dht_seg(0, 0, PROG_BITS, PROG_VALS)
    out += _dht_seg(1, 0, PROG_BITS, PROG_VALS)
    out += _seg(0xC2, struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, (hs << 4) | vs, 0])
                + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    for kind, ci, ss, se, ah, al in _PROG_SCANS:
        if kind == "dc_first":
            body, sel = dc_first(al), [1, 0x00, 2, 0x00, 3, 0x00]
        elif kind == "dc_refine":
            body, sel = dc_refine(al), [1, 0x00, 2, 0x00, 3, 0x00]
        elif kind == "ac_first":
            body, sel = ac_first(ci, ss, se, al), [ci + 1, 0x00]
        else:
            body, sel = ac_refine(ci, ss, se, al), [ci + 1, 0x00]
        out += _seg(0xDA, bytes([len(sel) // 2] + sel
                                + [ss, se, (ah << 4) | al])) + body
    return out + b"\xff\xd9"
