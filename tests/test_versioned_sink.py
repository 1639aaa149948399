"""Versioned corpus / manifest chain (M118, sources/training_sink.py):
snapshot isolation over immutable shard dirs — time-travel reads,
append-only versioning, retirement, diff, GC, tamper refusal."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.sources.training_sink import (
    MANIFEST,
    append_shards,
    gc_versions,
    list_versions,
    publish_version,
    read_version,
    version_diff,
    write_training_shards,
)


def _docs(spark, lo, hi, shard_base):
    n_shards = 2
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.lit(shard_base) + F.pmod(F.col("id"), n_shards)).alias("shard"),
        (F.col("id") - lo).alias("pos"),
    )


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("versioned") / "corpus")
    write_training_shards(_docs(spark, 0, 100, 0), path)
    m1 = publish_version(spark, path)
    append_shards(_docs(spark, 100, 160, 10), path)
    m2 = publish_version(spark, path)
    return path, m1, m2


def test_chain_metadata(chain):
    path, m1, m2 = chain
    assert list_versions(path) == [1, 2]
    assert (m1["version"], m1["parent"]) == (1, None)
    assert (m2["version"], m2["parent"]) == (2, 1)
    assert set(m1["shards"]) == {"0", "1"}
    assert set(m2["shards"]) == {"0", "1", "10", "11"}
    # head mirror tracks the latest version
    with open(os.path.join(path, MANIFEST)) as f:
        assert json.load(f)["version"] == 2


def test_time_travel_reads_pin_their_shard_set(spark, chain):
    path, _, _ = chain
    v1 = {r.doc_id for r in read_version(spark, path, 1).collect()}
    v2 = {r.doc_id for r in read_version(spark, path, 2).collect()}
    assert v1 == set(range(100))
    assert v2 == set(range(160))


def test_append_into_published_shard_refused(spark, chain):
    path, _, _ = chain
    with pytest.raises(ValueError, match="append-only"):
        append_shards(_docs(spark, 200, 220, 0), path)  # shard 0 clash


def test_read_unpublished_version_raises(spark, chain):
    path, _, _ = chain
    with pytest.raises(FileNotFoundError, match="have: \\[1, 2\\]"):
        read_version(spark, path, 9)


def test_version_diff_counts(chain):
    path, _, _ = chain
    d = version_diff(path, 1, 2)
    assert d == {"shards_added": ["10", "11"], "shards_removed": [],
                 "rows_added": 60, "rows_removed": 0}
    rev = version_diff(path, 2, 1)
    assert rev["shards_removed"] == ["10", "11"]
    assert rev["rows_removed"] == 60


def test_retire_then_gc_keeps_kept_versions_readable(
        spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("versioned_gc") / "corpus")
    write_training_shards(_docs(spark, 0, 100, 0), path)
    publish_version(spark, path)
    append_shards(_docs(spark, 100, 160, 10), path)
    publish_version(spark, path)
    # v3 retires the original shards (they stay on disk for v1/v2)
    publish_version(spark, path, shards=[10, 11])
    assert {r.doc_id for r in read_version(spark, path, 3).collect()} \
        == set(range(100, 160))
    assert {r.doc_id for r in read_version(spark, path, 1).collect()} \
        == set(range(100))
    out = gc_versions(path, keep=[3])
    assert out["versions_dropped"] == [1, 2]
    assert out["shards_deleted"] == ["0", "1"]
    assert list_versions(path) == [3]
    # the kept version still verifies byte-for-byte
    assert {r.doc_id for r in read_version(spark, path, 3).collect()} \
        == set(range(100, 160))
    with pytest.raises(FileNotFoundError):
        read_version(spark, path, 1)
    with pytest.raises(ValueError, match="unpublished"):
        gc_versions(path, keep=[1])


def test_tampered_shard_fails_only_referencing_versions(
        spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("versioned_tamper") / "corpus")
    write_training_shards(_docs(spark, 0, 100, 0), path)
    publish_version(spark, path)
    append_shards(_docs(spark, 100, 160, 10), path)
    publish_version(spark, path)
    # mutate a v2-only shard file
    sd = os.path.join(path, "shard=10")
    victim = [f for f in os.listdir(sd) if f.endswith(".parquet")][0]
    os.unlink(os.path.join(sd, victim))
    with pytest.raises(ValueError, match="fails verification"):
        read_version(spark, path, 2).collect()
    # v1 references only untouched shards: still green
    assert read_version(spark, path, 1).count() == 100


def _fresh_chain(spark, tmp_path):
    path = str(tmp_path / "corpus")
    write_training_shards(_docs(spark, 0, 100, 0), path)
    publish_version(spark, path)
    append_shards(_docs(spark, 100, 160, 10), path)
    publish_version(spark, path)
    return path


def test_compact_preserves_version_chain(spark, tmp_path):
    # ADVICE r5 fix: compaction used to swap in a dir holding only the
    # head mirror, destroying every _MANIFEST-v*.json.
    from batch_processing_analysis_spark.sources.training_sink import (
        compact_shards,
    )

    path = _fresh_chain(spark, tmp_path)
    before_v1 = {r.doc_id for r in read_version(spark, path, 1).collect()}
    compact_shards(spark, path)
    assert list_versions(path) == [1, 2]
    # both sealed versions still digest-verify and return the same sets
    assert {r.doc_id
            for r in read_version(spark, path, 1).collect()} == before_v1
    assert read_version(spark, path, 2).count() == 160
    # head mirror is the newest version manifest
    with open(os.path.join(path, MANIFEST)) as f:
        head = json.load(f)
    assert head["version"] == 2


def test_compact_head_mirror_respects_subset_head(spark, tmp_path):
    # A head version that sealed a shard SUBSET must survive compaction
    # as the head mirror (the all-shards rewrite manifest would clobber
    # the retirement).
    from batch_processing_analysis_spark.sources.training_sink import (
        compact_shards,
        load_verified_shards,
    )

    path = _fresh_chain(spark, tmp_path)
    publish_version(spark, path, shards=[10, 11])  # v3 retires 0/1
    compact_shards(spark, path)
    with open(os.path.join(path, MANIFEST)) as f:
        head = json.load(f)
    assert head["version"] == 3
    assert set(head["shards"]) == {"10", "11"}
    assert load_verified_shards(spark, path).count() == 60
    # the retired shards stay readable through the older versions
    assert read_version(spark, path, 2).count() == 160


def test_gc_rewrites_head_mirror(spark, tmp_path):
    # ADVICE r5 fix: gc of the head version left a stale mirror that
    # either errored on deleted shards or served a retired snapshot.
    from batch_processing_analysis_spark.sources.training_sink import (
        load_verified_shards,
    )

    path = _fresh_chain(spark, tmp_path)
    gc_versions(path, keep=[1])  # drops v2 (the head) and shards 10/11
    with open(os.path.join(path, MANIFEST)) as f:
        head = json.load(f)
    assert head["version"] == 1
    assert load_verified_shards(spark, path).count() == 100
    gc_versions(path, keep=[])
    assert not os.path.exists(os.path.join(path, MANIFEST))
    assert list_versions(path) == []


def test_compact_crash_window_recovery(spark, tmp_path):
    # The documented crash-window procedure (compact_shards docstring):
    # a crash between the two swap renames leaves `path` absent and the
    # pre-compact copy at `<path>.__precompact__`; recovery is one
    # rename back. Simulate the crash state and verify the recovery
    # restores a byte-readable, digest-valid chain.
    import shutil

    path = _fresh_chain(spark, tmp_path)
    before_v2 = {r.doc_id for r in read_version(spark, path, 2).collect()}
    backup = path.rstrip("/") + ".__precompact__"
    # crash state: first rename done, second never happened
    os.rename(path, backup)
    assert not os.path.exists(path)
    # recovery
    os.rename(backup, path)
    assert list_versions(path) == [1, 2]
    assert {r.doc_id
            for r in read_version(spark, path, 2).collect()} == before_v2
    # and a subsequent compaction completes normally on the recovered dir
    from batch_processing_analysis_spark.sources.training_sink import (
        compact_shards,
    )

    compact_shards(spark, path)
    assert {r.doc_id
            for r in read_version(spark, path, 2).collect()} == before_v2
    assert not os.path.exists(backup)
    shutil.rmtree(path, ignore_errors=True)
