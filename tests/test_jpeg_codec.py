"""Vendored baseline JPEG codec (operators/jpeg_codec.py, M149 —
VERDICT r7 task 6): encode/decode roundtrips across subsampling,
quality, restart markers, odd sizes and grayscale; loud named gates
for every unsupported T.81 mode; and the decoded Spark path on JPEG
payloads."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_analysis_spark.operators import jpeg_codec as J


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _rt(img: np.ndarray, **kw) -> np.ndarray:
    h, w = img.shape[:2]
    enc = J.encode_jpeg(h, w, img.tobytes(), **kw)
    hh, ww, rgb = J.decode_jpeg(enc)
    assert (hh, ww) == (h, w)
    return np.frombuffer(rgb, np.uint8).reshape(h, w, 3)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(x * 3, 0, 255), np.clip(y * 3, 0, 255),
                     np.clip(255 - (x + y), 0, 255)],
                    -1).astype(np.uint8)


def test_solid_color_near_exact():
    img = np.full((24, 40, 3), (200, 30, 90), dtype=np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        out = _rt(img, quality=90, subsampling=sub)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2, sub


def test_gradient_roundtrip_quality_ladder():
    img = _gradient(64, 80)
    prev = 99.0
    for sub, qual, floor in (("4:4:4", 95, 45), ("4:4:4", 75, 40),
                             ("4:2:0", 95, 40), ("4:2:0", 75, 35)):
        p = _psnr(_rt(img, quality=qual, subsampling=sub), img)
        assert p >= floor, (sub, qual, p)
    # quality monotonicity at fixed subsampling
    p95 = _psnr(_rt(img, quality=95), img)
    p50 = _psnr(_rt(img, quality=50), img)
    assert p95 > p50
    assert prev  # keeps flake8 quiet about the ladder loop


def test_odd_sizes_and_noise_with_restart_markers():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out = _rt(img, quality=95, subsampling="4:4:4", restart_interval=3)
    assert _psnr(out, img) >= 30
    out420 = _rt(img, quality=95, subsampling="4:2:0", restart_interval=2)
    assert out420.shape == img.shape


def test_grayscale_single_component():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 30), dtype=np.uint8)
    h, w, rgb = J.decode_jpeg(
        J.encode_jpeg_gray(19, 30, img.tobytes(), quality=95))
    out = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (out[..., 0] == out[..., 1]).all()
    assert (out[..., 0] == out[..., 2]).all()
    assert _psnr(out[..., 0], img) >= 35


def test_dct_matrix_is_orthonormal():
    # C @ C.T == I pins the IDCT as the exact inverse of the FDCT
    assert np.allclose(J._C @ J._C.T, np.eye(8), atol=1e-12)


def test_unsupported_modes_fail_by_name():
    img = _gradient(16, 16)
    enc = bytearray(J.encode_jpeg(16, 16, img.tobytes()))
    sof = bytes(enc).find(b"\xff\xc0")
    assert sof > 0
    arith = bytearray(enc)
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        J.decode_jpeg(bytes(arith))
    deep = bytearray(enc)
    deep[sof + 4] = 12  # precision byte of the SOF payload
    with pytest.raises(ValueError, match="12-bit"):
        J.decode_jpeg(bytes(deep))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError, match="truncated|marker"):
        J.decode_jpeg(bytes(enc[:len(enc) // 2]))


def test_image_features_jpeg_payloads(spark):
    """The decoded mapInPandas path on JPEG payloads, UNSKIPPED in any
    environment — the r7 'decoded path is PNG-only' gap (VERDICT r7
    missing #2) closed with the same assertions as the PNG variant
    (JPEG is lossy: the solid-color mean tolerates the measured +-2
    per-channel quantization error)."""
    from batch_processing_analysis_spark.operators import multimodal as M

    def solid(w, h, color, **kw):
        img = np.zeros((h, w, 3), np.uint8)
        img[:] = color
        return J.encode_jpeg(h, w, img.tobytes(), **kw)

    rows_in = [(1, solid(4, 3, (255, 0, 0))),
               (2, solid(18, 10, (10, 20, 30), subsampling="4:2:0"))]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows_in],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in M.image_features(media).collect()}
    assert rows[1]["height"] == 3 and rows[1]["width"] == 4
    assert rows[1]["channels"] == 3
    assert abs(rows[1]["mean_pixel_milli"] - 85_000) <= 2_000
    assert rows[2]["height"] == 10 and rows[2]["width"] == 18
    assert abs(rows[2]["mean_pixel_milli"] - 20_000) <= 2_000


# ---------------------------------------------------------------------------
# Progressive (SOF2) — VERDICT r8 task 6
# ---------------------------------------------------------------------------

def test_progressive_decode_equals_baseline_bit_exact():
    """The decisive oracle: encode_jpeg_progressive writes the SAME
    quantized coefficients as encode_jpeg through the 10-scan
    spectral-selection + successive-approximation script, so decoding
    both must give IDENTICAL pixels — across sizes, subsampling,
    quality, and per-scan restart markers (which also pin the
    progressive restart reset of DC predictors and EOB runs)."""
    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (16, 16), (41, 53), (64, 48), (100, 30)]:
        for subs in ("4:4:4", "4:2:0"):
            for rst in (0, 2):
                for img in (
                    rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
                    _gradient(h, w),
                ):
                    base = J.decode_jpeg(J.encode_jpeg(
                        h, w, img.tobytes(), quality=80,
                        subsampling=subs))
                    prog = J.decode_jpeg(J.encode_jpeg_progressive(
                        h, w, img.tobytes(), quality=80,
                        subsampling=subs, restart_interval=rst))
                    assert base == prog, (h, w, subs, rst)


def test_progressive_solid_color_long_eob_runs():
    """A solid image zeroes every AC coefficient: all AC scans are one
    giant cross-block EOB run (the (1<<r)+ext path), and the refine
    scans are EOB-run-only. Must still equal baseline decode."""
    for color in [(255, 0, 0), (10, 20, 30), (128, 128, 128)]:
        img = np.zeros((48, 64, 3), np.uint8)
        img[:] = color
        base = J.decode_jpeg(J.encode_jpeg(48, 64, img.tobytes()))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(
            48, 64, img.tobytes()))
        assert base == prog


def test_progressive_quality_ladder_psnr():
    img = _gradient(40, 56)
    prev = 0.0
    for q in (30, 60, 90):
        enc = J.encode_jpeg_progressive(40, 56, img.tobytes(), quality=q)
        _, _, rgb = J.decode_jpeg(enc)
        psnr = _psnr(np.frombuffer(rgb, np.uint8).reshape(40, 56, 3),
                     img)
        assert psnr > prev  # monotone in quality
        prev = psnr
    assert prev > 35.0


def test_progressive_is_sof2_and_multi_scan():
    enc = J.encode_jpeg_progressive(16, 16, _gradient(16, 16).tobytes())
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == len(J._PROG_SCANS)


def test_image_features_progressive_jpeg_payload(spark):
    """The decoded mapInPandas path on a PROGRESSIVE JPEG payload —
    the r8 'progressive fails loudly' gate replaced by a real decode
    in every reproducible environment (VERDICT r8 task 6 done
    criterion)."""
    from batch_processing_analysis_spark.operators import multimodal as M

    img = np.zeros((10, 18, 3), np.uint8)
    img[:] = (10, 20, 30)
    payload = J.encode_jpeg_progressive(10, 18, img.tobytes(),
                                        subsampling="4:2:0")
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary")
    row = M.image_features(media).collect()[0]
    assert row["height"] == 10 and row["width"] == 18
    assert row["channels"] == 3
    assert abs(row["mean_pixel_milli"] - 20_000) <= 2_000
