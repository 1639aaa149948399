"""WebDataset-style tar-shard sink/loader (M155) — the de-facto
container format for multimodal training corpora (Aizman et al.,
"High Performance I/O For Large Scale Deep Learning"; the public
`webdataset` library's layout): samples are adjacent entries
``{key}.{ext}`` inside ``shard-NNNNNN.tar`` files, data-loader
workers stream whole shards sequentially.

Engine rules:

- **Shard assignment is the caller's** (compose with
  ``operators.ordering.seeded_shuffle`` / rendezvous sharding, same
  contract as ``write_training_shards``): one hash exchange on the
  shard column co-locates each shard in one task, and a
  within-partition sort fixes the sample order inside the tar —
  training order is reproducible byte-for-byte.
- **Deterministic bytes**: USTAR entries with zeroed
  mtime/uid/gid/uname/gname and mode 0644, samples in ``pos`` order
  — the same DataFrame always produces bit-identical tars, so the
  manifest's sha256 digests are stable and a re-run is a no-op
  publish (pinned in tests/test_webdataset.py).
- **Scale envelope**: one shard = one ``applyInPandas`` group = one
  task-local tar build, so a shard must fit in task memory — the
  WebDataset convention of ~1 GB shards is exactly that envelope;
  at 1000 executors with shards ≥ executors the write is
  embarrassingly parallel. The path must be shared storage (every
  executor writes its own tars; local[*] and NFS/object-store
  mounts both qualify).
- **Loader-side pruning for free**: shards are independent files;
  ``read_webdataset_shards(shards=[...])`` lists only those tars
  (the standard per-worker shard-subset layout).

Format notes: payload columns map to entry extensions
(``payload_exts``); binary columns write raw bytes, string columns
UTF-8. NULL payloads skip that entry (WebDataset's optional-field
convention). Keys must be unique per shard — and must contain no
'.' (the public WebDataset convention splits an entry name into
key/extension at the FIRST dot, so the extension may be dotted,
``json.gz``, but the key may not; the writer validates, the reader
splits first-dot to interop with external tooling). Entries of one
sample are adjacent, ``.{ext}`` order = the ``payload_exts`` order.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WDS_MANIFEST = "_WDS_MANIFEST.json"

MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
])

# task-side manifest: MANIFEST_SCHEMA plus the attempt-specific temp
# name the driver must promote at commit (never published)
_TASK_MANIFEST_SCHEMA = T.StructType(
    [*MANIFEST_SCHEMA.fields, T.StructField("tmp", T.StringType())])

READ_SCHEMA = T.StructType([
    T.StructField("shard", T.LongType()),
    T.StructField("key", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def _shard_name(shard: int) -> str:
    return f"shard-{shard:06d}.tar"


def _build_tar(keys, columns, exts) -> bytes:
    """Deterministic in-memory USTAR tar: fixed metadata, caller-fixed
    sample order."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for i, key in enumerate(keys):
            for col, ext in exts.items():
                val = columns[col][i]
                if val is None:
                    continue
                payload = val if isinstance(val, (bytes, bytearray)) \
                    else str(val).encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(bytes(payload)))
    return buf.getvalue()


def write_webdataset_shards(
    df: DataFrame, path: str, *,
    key_col: str = "key", shard_col: str = "shard",
    pos_col: str = "pos",
    payload_exts: dict[str, str] | None = None,
) -> DataFrame:
    """Write ``df`` as ``<path>/shard-NNNNNN.tar`` WebDataset shards
    plus a driver-side ``_WDS_MANIFEST.json``; returns the manifest
    as a DataFrame (shard, path, n_samples, n_bytes, sha256).

    One shuffle (hash on ``shard_col``), per-group sort on ``pos``,
    one task-local tar build per shard. Publish is COMMIT-LAST:
    tasks write temp names and the driver swaps them over the final
    names only after the whole job succeeds, then drops shards the
    new publish no longer produces — a FAILED JOB (any task error)
    leaves the previous tars and manifest fully intact (test-pinned).

    Torn-publish window, stated honestly: the driver-side commit
    renames shard files ONE BY ONE (POSIX has no multi-file atomic
    rename), so a driver crash mid-commit can leave a mix of new and
    old tars beside a stale manifest. The manifest itself is updated
    atomically (temp + ``os.replace``) and LAST, so the torn state is
    always DETECTABLE — ``verify_webdataset`` flags every shard whose
    digest disagrees with the manifest — and re-running the same
    publish repairs it (the commit is idempotent).
    """
    payload_exts = payload_exts or {"payload": "bin"}
    dotted = [c for c, e in payload_exts.items()
              if e.startswith(".") or e.endswith(".")]
    if dotted:
        raise ValueError(
            f"payload_exts for {dotted} start/end with '.' — extensions "
            f"are written as '{{key}}.{{ext}}'; interior dots "
            f"('json.gz') are fine, leading/trailing are malformed")
    spark = df.sparkSession
    os.makedirs(path, exist_ok=True)
    # publish protocol (mirrors Spark's output-committer): each task
    # ATTEMPT writes ``_tmp_shard-NNNNNN.<attemptId>.tar`` — attempt
    # ids are globally unique, so a speculative twin or a zombie
    # attempt of the same shard can never interleave writes into one
    # file. The manifest row records which attempt's temp the driver
    # must promote; only after the whole job succeeds does the driver
    # rename the RECORDED attempts over the final names, remove stale
    # shards and loser-attempt temps, and rewrite the manifest — a
    # FAILED re-publish leaves the previous dataset (tars + manifest)
    # fully intact. Leftover temps from an earlier failure are swept
    # first.
    for old in os.listdir(path):
        if old.startswith("_tmp_shard-") and old.endswith(".tar"):
            os.remove(os.path.join(path, old))

    cols = [shard_col, key_col, pos_col, *payload_exts]
    out_dir = path
    exts = dict(payload_exts)
    kc, pc = key_col, pos_col

    def _write_group(pdf):
        import pandas as pd
        from pyspark import TaskContext

        pdf = pdf.sort_values(pc, kind="mergesort")
        shard = int(pdf.iloc[0][shard_col])
        keys = [str(k) for k in pdf[kc]]
        if len(set(keys)) != len(keys):
            raise ValueError(
                f"duplicate keys in shard {shard} — WebDataset entry "
                f"names must be unique per shard")
        bad = sorted(k for k in keys if "." in k)[:3]
        if bad:
            raise ValueError(
                f"keys {bad} in shard {shard} contain '.' — WebDataset "
                f"splits entry names at the FIRST dot, so a dotted key "
                f"corrupts the key/extension boundary for every reader")
        data = _build_tar(keys, {c: list(pdf[c]) for c in exts}, exts)
        fname = _shard_name(shard)
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        tmp = f"_tmp_{fname[:-len('.tar')]}.{attempt}.tar"
        with open(os.path.join(out_dir, tmp), "wb") as f:
            f.write(data)
        return pd.DataFrame([{
            "shard": shard, "path": fname, "n_samples": len(keys),
            "n_bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest(),
            "tmp": tmp,
        }])

    manifest_rows = (
        df.select(*cols)
        .repartition(F.col(shard_col))
        .groupBy(shard_col)
        .applyInPandas(_write_group, _TASK_MANIFEST_SCHEMA)
        .collect()
    )
    manifest = sorted((r.asDict() for r in manifest_rows),
                      key=lambda r: r["shard"])
    # commit: atomically swap each RECORDED attempt's temp over its
    # final name, then drop shards the new publish no longer produces
    # and any loser-attempt temps (speculative twins / zombie retries)
    new_names = {m["path"] for m in manifest}
    for m in manifest:
        os.replace(os.path.join(path, m.pop("tmp")),
                   os.path.join(path, m["path"]))
    for old in os.listdir(path):
        if old.startswith("_tmp_shard-") and old.endswith(".tar"):
            os.remove(os.path.join(path, old))
        elif (old.startswith("shard-") and old.endswith(".tar")
                and old not in new_names):
            os.remove(os.path.join(path, old))
    # manifest update is atomic (temp + replace) and LAST: a reader
    # never observes a half-written manifest, and a driver crash
    # before this line leaves the OLD manifest — torn tars are then
    # detectable via verify_webdataset (see docstring)
    mtmp = os.path.join(path, WDS_MANIFEST + ".tmp")
    with open(mtmp, "w") as f:
        json.dump({"shards": manifest}, f, indent=1, sort_keys=True)
    os.replace(mtmp, os.path.join(path, WDS_MANIFEST))
    return spark.createDataFrame(
        [(m["shard"], m["path"], m["n_samples"], m["n_bytes"],
          m["sha256"]) for m in manifest],
        MANIFEST_SCHEMA)


def read_webdataset_shards(
    spark: SparkSession, path: str,
    shards: Sequence[int] | None = None,
) -> DataFrame:
    """Load shards back as long-format rows (shard, key, ext,
    payload). ``shards`` prunes at the FILE level — only those tars
    are listed and opened (assert via ``df.inputFiles()``)."""
    if shards is not None:
        paths = [os.path.join(path, _shard_name(s)) for s in shards]
    else:
        paths = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.startswith("shard-") and f.endswith(".tar")]
    if not paths:
        raise FileNotFoundError(
            f"no shard-*.tar files under {path!r} — nothing published "
            f"here yet (write_webdataset_shards), or wrong directory")
    binary = spark.read.format("binaryFile").load(paths)

    def _untar(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = int(os.path.basename(p)[len("shard-"):-len(".tar")])
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            # external WebDataset tooling emits leading
                            # directory / PAX header members — skip,
                            # never crash the task
                            continue
                        # FIRST-dot split (public WebDataset layout):
                        # the key is the basename up to the first dot,
                        # the extension is everything after — dotted
                        # extensions ('json.gz') belong to the ext
                        stem, _, ext = m.name.partition(".")
                        rows.append((shard, stem, ext,
                                     tf.extractfile(m).read()))
            yield pd.DataFrame(rows, columns=["shard", "key", "ext",
                                              "payload"])

    return binary.select("path", "content").mapInPandas(_untar, READ_SCHEMA)


def verify_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Re-digest every tar on disk against the manifest; returns rows
    (shard, path, ok, expected, actual) — any ``ok=false`` row is a
    corrupted/tampered/missing shard (same contract as
    ``training_sink.load_verified_shards``)."""
    with open(os.path.join(path, WDS_MANIFEST)) as f:
        manifest = json.load(f)["shards"]
    rows = []
    for m in manifest:
        full = os.path.join(path, m["path"])
        try:
            with open(full, "rb") as f:
                actual = hashlib.sha256(f.read()).hexdigest()
        except FileNotFoundError:
            actual = ""
        rows.append((int(m["shard"]), m["path"],
                     actual == m["sha256"], m["sha256"], actual))
    return spark.createDataFrame(
        rows, "shard long, path string, ok boolean, expected string, "
              "actual string")
