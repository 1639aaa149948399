"""WebDataset tar-shard sink/loader tests (M155,
sources/webdataset.py): roundtrip with real multimodal payloads
(vendored PNG encoder), bit-deterministic shard bytes, file-level
shard pruning, manifest digest verification, per-shard key
uniqueness, NULL-payload optional-field convention."""

from __future__ import annotations

import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.png_codec import encode_png
from batch_processing_analysis_spark.sources import webdataset as WDS


def _corpus(spark, n=12, n_shards=3):
    rows = []
    for i in range(n):
        png = encode_png(2, 2, bytes(((i * 7 + j) % 256)
                                     for j in range(12)))
        txt = None if i % 5 == 4 else f"caption {i}"
        rows.append((i % n_shards, f"sample{i:04d}", i, txt, png))
    return spark.createDataFrame(
        rows, "shard long, key string, pos long, txt string, img binary")


def test_roundtrip_and_adjacency(spark, tmp_path):
    path = str(tmp_path / "wds")
    df = _corpus(spark)
    manifest = WDS.write_webdataset_shards(
        df, path, payload_exts={"txt": "txt", "img": "png"}).collect()
    assert {r["shard"] for r in manifest} == {0, 1, 2}
    assert sum(r["n_samples"] for r in manifest) == 12

    back = WDS.read_webdataset_shards(spark, path).collect()
    by_key = {}
    for r in back:
        by_key.setdefault(r["key"], {})[r["ext"]] = bytes(r["payload"])
    src = {r["key"]: r for r in df.collect()}
    assert set(by_key) == set(src)
    for key, parts in by_key.items():
        assert parts["png"] == bytes(src[key]["img"])
        if src[key]["txt"] is None:
            assert "txt" not in parts  # NULL payload -> entry skipped
        else:
            assert parts["txt"].decode() == src[key]["txt"]

    # WebDataset contract: one sample's entries are ADJACENT in the
    # tar and in pos order across samples
    with tarfile.open(os.path.join(path, "shard-000000.tar")) as tf:
        names = [m.name for m in tf]
    stems = [n.rsplit(".", 1)[0] for n in names]
    seen = []
    for s in stems:
        if not seen or seen[-1] != s:
            seen.append(s)
    assert len(seen) == len(set(seen)), "sample entries not adjacent"
    assert seen == sorted(seen), "samples not in pos order"


def test_deterministic_bytes(spark, tmp_path):
    df = _corpus(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r["shard"]: r["sha256"] for r in WDS.write_webdataset_shards(
        df, p1, payload_exts={"txt": "txt", "img": "png"}).collect()}
    m2 = {r["shard"]: r["sha256"] for r in WDS.write_webdataset_shards(
        df.orderBy(F.rand(7)), p2,
        payload_exts={"txt": "txt", "img": "png"}).collect()}
    assert m1 == m2, "tar bytes must not depend on input row order"


def test_shard_pruning_is_file_level(spark, tmp_path):
    path = str(tmp_path / "wds")
    WDS.write_webdataset_shards(_corpus(spark), path,
                                payload_exts={"img": "png"})
    sub = WDS.read_webdataset_shards(spark, path, shards=[1])
    opened = sub.inputFiles()
    assert len(opened) == 1 and opened[0].endswith("shard-000001.tar")
    assert {r["shard"] for r in sub.collect()} == {1}


def test_manifest_verification_catches_tamper(spark, tmp_path):
    path = str(tmp_path / "wds")
    WDS.write_webdataset_shards(_corpus(spark), path,
                                payload_exts={"img": "png"})
    ok = WDS.verify_webdataset(spark, path).collect()
    assert all(r["ok"] for r in ok)
    victim = os.path.join(path, "shard-000002.tar")
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    after = {r["shard"]: r["ok"]
             for r in WDS.verify_webdataset(spark, path).collect()}
    assert after == {0: True, 1: True, 2: False}
    # manifest file itself is valid JSON with sorted keys
    j = json.load(open(os.path.join(path, WDS.WDS_MANIFEST)))
    assert len(j["shards"]) == 3


def test_duplicate_keys_are_loud(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "same", 0, b"a"), (0, "same", 1, b"b")],
        "shard long, key string, pos long, payload binary")
    with pytest.raises(Exception, match="duplicate keys"):
        WDS.write_webdataset_shards(df, str(tmp_path / "dup"))


def test_overwrite_removes_stale_shards(spark, tmp_path):
    path = str(tmp_path / "wds")
    WDS.write_webdataset_shards(_corpus(spark, n_shards=3), path,
                                payload_exts={"img": "png"})
    assert os.path.exists(os.path.join(path, "shard-000002.tar"))
    WDS.write_webdataset_shards(_corpus(spark, n_shards=2), path,
                                payload_exts={"img": "png"})
    tars = sorted(f for f in os.listdir(path) if f.endswith(".tar"))
    assert tars == ["shard-000000.tar", "shard-000001.tar"]


def test_failed_republish_preserves_previous_dataset(spark, tmp_path):
    # commit-last protocol: a re-publish that FAILS (duplicate keys in
    # one shard) must leave the previous tars AND manifest intact and
    # verifiable — never a half-deleted dataset
    path = str(tmp_path / "wds")
    WDS.write_webdataset_shards(_corpus(spark), path,
                                payload_exts={"img": "png"})
    before = {f: open(os.path.join(path, f), "rb").read()
              for f in os.listdir(path)}
    bad = spark.createDataFrame(
        [(0, "same", 0, b"a"), (0, "same", 1, b"b")],
        "shard long, key string, pos long, payload binary")
    with pytest.raises(Exception, match="duplicate keys"):
        WDS.write_webdataset_shards(bad, path)
    after = {f: open(os.path.join(path, f), "rb").read()
             for f in os.listdir(path) if not f.startswith("_tmp_")}
    assert after == before
    assert all(r["ok"] for r in WDS.verify_webdataset(spark, path)
               .collect())


def test_reader_skips_non_regular_members(spark, tmp_path):
    # external WebDataset tooling emits leading directory / PAX
    # header members; the reader must skip them, not crash the task
    import io
    import tarfile

    path = str(tmp_path / "ext")
    os.makedirs(path)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("samples/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("samples/k0.txt")
        body = b"hello"
        info.size = len(body)
        tf.addfile(info, io.BytesIO(body))
    with open(os.path.join(path, "shard-000000.tar"), "wb") as f:
        f.write(buf.getvalue())
    rows = WDS.read_webdataset_shards(spark, path).collect()
    assert [(r["key"], bytes(r["payload"])) for r in rows] == [
        ("samples/k0", b"hello")]
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no shard-"):
        WDS.read_webdataset_shards(spark, str(empty))
