"""Multimodal binary plumbing: frame sampling and payload resize
(operators/multimodal.py) on payloads with edge-case sizes."""

from __future__ import annotations

from batch_processing_analysis_spark.operators import multimodal as M


def _payloads(spark, items):
    return spark.createDataFrame(
        [(i, "blob", bytearray(b)) for i, b in items],
        "doc_id long, modality string, payload binary",
    )


def test_sample_frames_sizes_and_indices(spark):
    # 70 bytes @ frame_size=32 -> frames 0,1,2 (sizes 32,32,6); every 2nd
    # keeps 0 and 2. 10-byte payload -> one short frame. Empty -> none.
    data = _payloads(spark, [(1, bytes(range(70))), (2, b"0123456789"), (3, b"")])
    rows = {(r["doc_id"], r["frame_index"]): r
            for r in M.sample_frames(data, frame_size=32, every_n=2).collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0)}
    assert rows[(1, 0)]["frame_bytes"] == 32
    assert rows[(1, 2)]["frame_bytes"] == 6
    assert rows[(1, 2)]["frame_checksum"] == sum(range(64, 70)) % 997
    assert rows[(2, 0)]["frame_bytes"] == 10


def test_resize_payload_stride(spark):
    data = _payloads(spark, [(1, bytes(range(10))), (2, b"")])
    rows = {r["doc_id"]: r for r in M.resize_payload(data, factor=4).collect()}
    # bytes(range(10))[::4] == bytes([0, 4, 8])
    assert rows[1]["n_bytes"] == 10
    assert rows[1]["resized_bytes"] == 3
    assert rows[1]["resized_checksum"] == (0 + 4 + 8) % 997
    assert rows[2]["resized_bytes"] == 0 and rows[2]["resized_checksum"] == 0


def test_decode_image_gate_without_codec():
    # In a codec-less environment the swap-point must fail loudly with
    # the install hint, not a silent fake decode.
    import pytest

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.decode_image(b"\x89PNG\r\n\x1a\n not really a png")
    else:
        pytest.skip("PIL present; covered by test_image_features_with_pil")


def test_decode_audio_gate_without_codec():
    import pytest

    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="soundfile"):
            M.decode_audio(b"RIFF fake wav bytes")
    else:  # pragma: no cover - environment-dependent branch
        import io

        import numpy as np
        import soundfile as sf

        buf = io.BytesIO()
        sf.write(buf, np.zeros(16, dtype="float32"), 8000, format="WAV")
        samples, rate = M.decode_audio(buf.getvalue())
        assert rate == 8000 and len(samples) == 16


def test_image_features_with_pil(spark):
    # End-to-end decoded path: only runs where the codec exists, so the
    # day the environment has PIL this proves the mapInPandas structure
    # (schema, Arrow batch shape, per-payload decode) is real.
    import io

    import pytest

    PILImage = pytest.importorskip("PIL.Image")

    def png(w, h, color):
        buf = io.BytesIO()
        PILImage.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    media = _payloads(
        spark,
        [(1, png(4, 3, (255, 0, 0))), (2, png(2, 2, (10, 20, 30)))],
    )
    rows = {r["doc_id"]: r for r in M.image_features(media).collect()}
    assert rows[1]["height"] == 3 and rows[1]["width"] == 4
    assert rows[1]["channels"] == 3
    # mean of (255,0,0) pixels = 85 exactly -> 85000 millis
    assert rows[1]["mean_pixel_milli"] == 85_000
    assert rows[2]["mean_pixel_milli"] == (10 + 20 + 30) * 1000 // 3


def test_payload_neardup_detects_truncated_copy(spark):
    from batch_processing_analysis_spark.operators.multimodal import (
        payload_neardup_pairs,
    )

    blob = bytes(range(256)) * 8  # 2 KB structured payload
    media = spark.createDataFrame(
        [
            (1, blob),
            (2, blob[:-16]),          # truncated copy: near-dup
            (3, bytes(reversed(blob))),  # same bytes, different order
            (4, b"\x00" * 64),        # unrelated
        ],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in payload_neardup_pairs(media, max_hamming=4).collect()
    }
    assert (1, 2) in pairs  # truncation survives byte-gram simhash
    assert all(4 not in p for p in pairs)  # unrelated blob stays out
