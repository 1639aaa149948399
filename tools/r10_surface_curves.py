"""Scale measurements for the round-9 surface (VERDICT r9 task 5):

1. **Warm ×factor curves for q168/q169 and the new q171/q172** — the
   r9-committed curves were overhead-dominated (the ×10 run measured
   FASTER than the cold base), so this protocol takes min-of-``reps``
   (default 3) after an untimed warm-up at BOTH sizes and records the
   absolute times so an overhead-dominated row is visible as such
   (sub-second base ⇒ the ratio is a fixed-cost measurement, not a
   scaling signal — flagged in the row).
2. **q170's encode+probe split** — publish-once vs probe-per-batch
   scale differently by design: the encode pass is linear in corpus
   size (one Arrow kernel scan), the probe reads the 32×-smaller code
   table. Measured separately at base and ×factor corpus with the
   query set fixed.
3. **WebDataset write/read throughput** at an sf0.1-equivalent payload
   count (5k samples, ~12 KB PNG payloads): rows/s and MB/s for the
   sharded write (commit-last publish included) and the pruned read.
4. **Perceptual near-dup pipeline row** (decode → dHash → banded
   pairs) over the same corpus: half PNG, half JPEG-q90 re-encodes of
   the same pixels, so the pair stage finds the planted CROSS-CODEC
   duplicates (M159's claim) while the row times the full
   decode-dominated path.

Usage: python tools/r10_surface_curves.py [--factor 10] [--reps 3]
       [--n-media 5000] [--out R10_SURFACE_CURVES.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scaling_curves import build_blowup  # noqa: E402


def _timed(fn, reps: int) -> float:
    fn()  # untimed warm-up
    best = 9e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-media", type=int, default=5000)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from batch_processing_analysis_spark.operators import (
        multimodal as MM,
    )
    from batch_processing_analysis_spark.operators import (
        similarity as S,
    )
    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_eventlog,
        queries_relational,
        queries_text,
    )
    from batch_processing_analysis_spark.session import get_spark
    from batch_processing_analysis_spark.sources import webdataset as WD
    from batch_processing_analysis_spark.sources.tables import load_table

    spark = get_spark("r10_surface_curves")
    allq = {**registry.QUERIES, **registry.EXTRA_QUERIES}
    result: dict = {"sf_dir": args.sf_dir, "factor": args.factor,
                    "reps": args.reps}

    # ---- 1. warm curves ------------------------------------------------
    blow = build_blowup(spark, args.sf_dir, args.factor)
    curves = {}
    for name in ("q168_hist_drift", "q169_url_domain_census",
                 "q171_psl_registered_domain", "q172_url_governance"):
        fn = allq[name]
        base = _timed(lambda: _noop(fn(spark, args.sf_dir)), args.reps)
        big = _timed(lambda: _noop(fn(spark, blow)), args.reps)
        row = {"base_s": base, f"x{args.factor}_s": big,
               "time_ratio": round(big / base, 2) if base else None}
        if base < 1.0:
            row["note"] = ("overhead-dominated: sub-second base means "
                           "the ratio measures fixed job cost, not "
                           "scaling")
        curves[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    result["warm_curves"] = curves

    # ---- 2. q170 encode/probe split ------------------------------------
    split = {}
    for label, d in (("base", args.sf_dir), (f"x{args.factor}", blow)):
        embs = load_table(spark, d, "embeddings")
        queries = embs.filter(F.col("vec_id") < 10)
        prefix = f"r10c_pq_{label.replace('x', 'f')}"

        def _publish():
            S.publish_pq_index(spark, embs, prefix, dim=64, m=4,
                               ksub=8, stride=50)

        enc_s = _timed(_publish, args.reps)
        probe_s = _timed(
            lambda: _noop(S.pq_topk_from_index(spark, queries, prefix,
                                               dim=64, m=4, k=5)),
            args.reps)
        n = embs.count()
        split[label] = {"n_vectors": n, "encode_publish_s": enc_s,
                        "probe_topk_s": probe_s}
        print(f"pq {label}: {split[label]}", file=sys.stderr)
    b, g = split["base"], split[f"x{args.factor}"]
    split["encode_ratio"] = round(
        g["encode_publish_s"] / b["encode_publish_s"], 2)
    split["probe_ratio"] = round(
        g["probe_topk_s"] / b["probe_topk_s"], 2)
    result["pq_split"] = split

    # ---- 3/4. media corpus: webdataset + perceptual pipeline -----------
    # Deterministic 64x64 images: pixel pattern keyed by i % (n/2), so
    # every image has exactly one twin — the twin is PNG when i is
    # even, JPEG-q90 when odd (same pixels, different codec), making
    # the pair stage find n/2 planted CROSS-CODEC near-dups.
    n_media = args.n_media
    half = n_media // 2

    def _gen(batches):
        import numpy as np
        import pandas as pd

        from batch_processing_analysis_spark.operators.jpeg_codec import (
            encode_jpeg,
        )
        from batch_processing_analysis_spark.operators.png_codec import (
            encode_png,
        )

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["id"]:
                seed = int(i) % half
                rng = np.random.RandomState(seed)
                rgb = rng.randint(0, 256, size=(64, 64, 3),
                                  dtype=np.uint8)
                raw = rgb.tobytes()
                data = (encode_png(64, 64, raw) if i < half
                        else encode_jpeg(64, 64, raw, quality=90))
                ids.append(int(i))
                payloads.append(data)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "payload": payloads})

    media = (
        spark.range(n_media).select(F.col("id"))
        .repartition(32)
        .mapInPandas(_gen, "doc_id long, payload binary")
        .persist()
    )
    n_rows = media.count()  # materialize the corpus before timing
    total_mb = media.select(
        F.sum(F.length("payload")).alias("b")).collect()[0]["b"] / 2**20

    wds_dir = "/tmp/r10c_wds"
    med = media.withColumn("shard", F.col("doc_id") % 32) \
        .withColumn("pos", F.col("doc_id")) \
        .withColumn("key", F.concat(F.lit("k"),
                                    F.col("doc_id").cast("string")))
    write_s = _timed(
        lambda: WD.write_webdataset_shards(
            med, wds_dir, payload_exts={"payload": "bin"}).count(),
        args.reps)
    read_s = _timed(
        lambda: _noop(WD.read_webdataset_shards(spark, wds_dir)),
        args.reps)
    result["webdataset"] = {
        "n_samples": n_rows, "total_mb": round(total_mb, 1),
        "write_s": write_s, "read_s": read_s,
        "write_rows_per_s": round(n_rows / write_s, 0),
        "write_mb_per_s": round(total_mb / write_s, 1),
        "read_rows_per_s": round(n_rows / read_s, 0),
        "read_mb_per_s": round(total_mb / read_s, 1),
    }
    print(f"webdataset: {result['webdataset']}", file=sys.stderr)

    pairs = [0]

    def _pipeline():
        pairs[0] = MM.perceptual_neardup_pairs(media, max_hamming=3) \
            .count()

    pipe_s = _timed(_pipeline, max(args.reps - 1, 1))
    result["perceptual_pipeline"] = {
        "n_images": n_rows, "decode_dhash_pairs_s": pipe_s,
        "images_per_s": round(n_rows / pipe_s, 0),
        "pairs_found": pairs[0],
        "planted_cross_codec_pairs": half,
    }
    print(f"perceptual: {result['perceptual_pipeline']}",
          file=sys.stderr)

    text = json.dumps(result, indent=1)
    if args.out == "-":
        print(text)
    else:
        Path(args.out).write_text(text + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
