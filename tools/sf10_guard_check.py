"""Refusal-path capacity check at the ×100 blow-up (SURVEY §6.1d-r8).

The r8 sf10 probe showed both edit-distance guard AGGREGATES dying in
SparkOutOfMemoryError at the DEFAULT probe session (16 g heap, 32
shuffle partitions) — the localCheckpoint-persisted chunk/substring
frames pinned storage memory against the guard's own aggregate. After
the raw-lineage restructure (dedup.py / incremental.py, r8), this
script proves the refusal path works in default memory: run each
edit-distance operator over the ×100 corpus with ``max_candidates=0``
(the zipf_curves measure_bound protocol) and record the measured
bound from the trip message. Completing WITHOUT an OOM is the pass
criterion; the bound value is the ×100 datum for the curve record.

Usage: python tools/sf10_guard_check.py [--blowup-dir DIR] [--out F]
(assumes the blow-up dir already exists — the probe builds it).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blowup-dir",
                    default="/tmp/spark_graft_scale_x100_full_sf0.1")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from batch_processing_analysis_spark.operators import incremental as INC
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
        edjoin_pairs,
    )
    from batch_processing_analysis_spark.session import get_spark
    from batch_processing_analysis_spark.sources.tables import load_table

    spark = get_spark("sf10_guard_check")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.blowup_dir, "documents").select(
        "doc_id", "text")

    out: dict = {"metric": "sf10_guard_refusal_check",
                 "conf": {"driver_memory": "default-16g",
                          "shuffle_partitions":
                          spark.conf.get("spark.sql.shuffle.partitions")},
                 "results": {}}

    def measure(label, fn) -> None:
        t0 = time.time()
        try:
            fn().count()
            out["results"][label] = {"status": "ran_under_zero_budget?!"}
        except CandidateVolumeExceeded as e:
            bound = int(str(e).split("upper bound ")[1].split(" exceeds")[0])
            out["results"][label] = {
                "status": "tripped_in_default_memory",
                "bound": bound,
                "guard_seconds": round(time.time() - t0, 1),
            }
        except Exception as e:
            out["results"][label] = {"status": f"error:{type(e).__name__}"}
            print(f"{label}: {e}", file=sys.stderr)
        print(f"{label}: {out['results'][label]}", file=sys.stderr)

    measure("edjoin_pairs_x100",
            lambda: edjoin_pairs(docs, d=10, q=8, max_candidates=0))
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    measure("edjoin_increment_x100",
            lambda: INC.edjoin_increment_pairs(base, delta, d=10, q=8,
                                               max_candidates=0))

    text = json.dumps(out, indent=2)
    if args.out == "-":
        print(text)
    else:
        Path(args.out).write_text(text + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
