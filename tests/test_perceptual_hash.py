"""Cross-codec perceptual near-dup tests (M159,
operators/multimodal.py:dhash_bits / perceptual_hashes /
perceptual_neardup_pairs): the same picture saved as PNG and as JPEG
must hash together — the capability byte-level signatures (M51)
cannot have — and the Hamming band join must be EXACT (brute-force
parity) by the pigeonhole guarantee."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_analysis_spark.operators import multimodal as M
from batch_processing_analysis_spark.operators.jpeg_codec import encode_jpeg
from batch_processing_analysis_spark.operators.png_codec import encode_png

H, W = 32, 36


def _gradient(seed_shift=0):
    img = np.zeros((H, W, 3), dtype=np.uint8)
    for y in range(H):
        for x in range(W):
            img[y, x] = (((x + seed_shift) * 255) // W,
                         (y * 255) // H,
                         ((x + y) * 255) // (W + H))
    return img


def _noise(seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(H, W, 3), dtype=np.uint8)


def test_dhash_properties():
    img = _gradient()
    d = M.dhash_bits(img)
    assert 0 <= d < (1 << 64)
    # exact brightness invariance (no saturation in this gradient)
    shifted = (img.astype(np.int64) + 10).clip(0, 255).astype(np.uint8)
    assert M.dhash_bits(shifted) == d
    # unrelated content is far away
    assert bin(d ^ M.dhash_bits(_noise(0))).count("1") > 10
    with pytest.raises(ValueError, match="at least 8x9"):
        M.dhash_bits(np.zeros((4, 4, 3), dtype=np.uint8))


def test_cross_codec_same_hash(spark):
    # the SAME pixels through PNG and through lossy JPEG (q90 and q60)
    # land on the same 64 bits on this smooth image — the cross-codec
    # near-dup capability in its sharpest form
    img = _gradient()
    rgb = img.tobytes()
    payloads = [
        (1, encode_png(H, W, rgb)),
        (2, encode_jpeg(H, W, rgb, quality=90)),
        (3, encode_jpeg(H, W, rgb, quality=60)),
        (4, encode_png(H, W, _noise(7).tobytes())),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id long, payload binary")
    hashes = {r["doc_id"]: r["dhash"]
              for r in M.perceptual_hashes(media).collect()}
    assert hashes[1] == hashes[2] == hashes[3]
    assert hashes[4] != hashes[1]


def test_neardup_pairs_brute_force_parity(spark):
    # operator pairs == all-pairs popcount filter (the banding is an
    # exact candidate superset at 64 bits / max_hamming+1 bands)
    imgs = [
        _gradient(),                      # 0: anchor
        _gradient(),                      # 1: identical twin (PNG)
        (_gradient().astype(np.int64) + 8).clip(0, 255)
        .astype(np.uint8),                # 2: brightness twin
        _noise(1), _noise(2), _noise(3),  # 3-5: unrelated
    ]
    payloads = []
    for i, im in enumerate(imgs):
        raw = im.tobytes()
        payloads.append(
            (i, encode_jpeg(H, W, raw, quality=90) if i == 1
             else encode_png(H, W, raw)))
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id long, payload binary")

    for h in (0, 3, 7):
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in M.perceptual_neardup_pairs(
                   media, max_hamming=h).collect()}
        hashes = {r["doc_id"]: r["dhash"] & ((1 << 64) - 1)
                  for r in M.perceptual_hashes(media).collect()}
        ids = sorted(hashes)
        expect = {}
        for i in ids:
            for j in ids:
                if i < j:
                    d = bin(hashes[i] ^ hashes[j]).count("1")
                    if d <= h:
                        expect[(i, j)] = d
        assert got == expect, (h, got, expect)
    # the codec twins are found at every radius incl. 0
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got


def test_neardup_invalid_radius_is_loud(spark):
    media = spark.createDataFrame([(1, bytearray(b"x"))],
                                  "doc_id long, payload binary")
    with pytest.raises(ValueError, match="pigeonhole"):
        M.perceptual_neardup_pairs(media, max_hamming=64)


def _wav_bytes(samples, width=2, rate=16000):
    """Minimal stdlib WAV writer for fixtures (int PCM)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            q = (np.clip(samples, -1, 32767 / 32768)
                 * 32768).round().astype("<i2")
        else:  # 8-bit unsigned
            q = (np.clip(samples, -1, 127 / 128) * 128
                 + 128).round().astype("u1")
        wf.writeframes(q.tobytes())
    return buf.getvalue()


def _tone(freq, n=4000, amp=0.5):
    t = np.arange(n) / 16000.0
    return (amp * np.sin(2 * np.pi * freq * t)
            * np.linspace(1.0, 0.2, n)).astype(np.float64)


def test_audio_energy_hash_properties():
    s = _tone(440)
    h = M.audio_energy_hash(s)
    # power-of-two gain is EXACTLY invariant
    assert M.audio_energy_hash(s * 0.5) == h
    # different content is far away
    assert bin(h ^ M.audio_energy_hash(_tone(97, amp=0.3)[::-1])
               ).count("1") > 10
    with pytest.raises(ValueError, match=">= 65 samples"):
        M.audio_energy_hash(np.zeros(10))


def test_audio_cross_depth_and_pairs(spark):
    a = _tone(440)
    b = _tone(97, amp=0.3)[::-1]
    payloads = [
        (1, _wav_bytes(a, width=2)),
        (2, _wav_bytes(a * 0.5, width=2)),   # gain twin
        (3, _wav_bytes(a, width=1)),         # 8-bit re-encode
        (4, _wav_bytes(b, width=2)),         # unrelated
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id long, payload binary")
    hashes = {r["doc_id"]: r["ahash"] & ((1 << 64) - 1)
              for r in M.audio_fingerprints(media).collect()}
    assert hashes[1] == hashes[2]
    # 8-bit quantization moves only near-tie contour bits
    d13 = bin(hashes[1] ^ hashes[3]).count("1")
    assert d13 <= 6, d13
    assert bin(hashes[1] ^ hashes[4]).count("1") > 10

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in M.audio_neardup_pairs(media, max_hamming=7).collect()}
    ids = sorted(hashes)
    expect = {(i, j): bin(hashes[i] ^ hashes[j]).count("1")
              for i in ids for j in ids
              if i < j and bin(hashes[i] ^ hashes[j]).count("1") <= 7}
    assert got == expect
    assert (1, 2) in got and (1, 3) in got and (1, 4) not in got
