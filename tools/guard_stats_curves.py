"""Delta-proportional guard measurement (VERDICT r8 task 4 "done"
criterion): show that with a published stats table the per-ingest
candidate-volume guard cost tracks |delta|, not |base|.

Protocol: a FIXED delta (Zipf fixture, same construction as
tools/zipf_curves.py) is ingested against a published base at two
sizes (n and factor·n docs). For each of the three published-base
exact increments we time JUST the guard — a zero-budget call, whose
refusal path executes exactly the bound aggregate and nothing else
(the r8 restructure made that path materialization-free) — twice:

- ``stats``: the r9 shape — the guard aggregates delta lineage and
  joins the published ``_pstats`` / ``_chunkstats``/``_substats``/
  ``_tinystats`` tables;
- ``fallback``: the r8 shape — the stats tables are hidden (renamed),
  so the guard re-derives base-side counts from raw ranked/chunk/
  substring lineage.

Expected signature: ``fallback`` guard time grows ~linearly with the
base (it scans base lineage); ``stats`` guard time stays ~flat (the
stats tables are vocabulary-sized aggregates, and the delta is
fixed). Bound values are asserted IDENTICAL between the two shapes —
the correctness half is pinned by
tests/test_{bucketed_ppjoin,containment_increment,edjoin_increment}.py;
this tool records the performance half.

Usage: python tools/guard_stats_curves.py [--n 5000] [--factor 10]
       [--out GUARD_STATS_r09.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from zipf_curves import build_corpus  # noqa: E402  (same fixture)


def _trip_seconds_and_bound(fn) -> tuple[float, int]:
    """min-of-2 wall time of the zero-budget guard refusal + the
    measured bound parsed from the message."""
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )

    best, bound = 9e9, -1
    for _ in range(3):  # first run warms the publish scan caches
        t0 = time.time()
        try:
            fn().count()
        except CandidateVolumeExceeded as e:
            bound = int(str(e).split("upper bound ")[1]
                        .split(" exceeds")[0])
        dt = time.time() - t0
        best = min(best, dt)
    return round(best, 3), bound


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--words-per-doc", type=int, default=40)
    ap.add_argument("--s", type=float, default=1.1)
    ap.add_argument("--dup-rate", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from batch_processing_analysis_spark.operators import (
        incremental as I,
    )
    from batch_processing_analysis_spark.session import get_spark

    spark = get_spark("guard_stats_curves")

    # one fixed delta for every base size
    delta_path = build_corpus(
        spark, max(args.n // 10, 500), args.words_per_doc, args.s,
        args.dup_rate, args.seed + 99, "/tmp/guard_stats_delta")
    delta = spark.read.parquet(f"{delta_path}/documents.parquet")
    delta = delta.select((F.col("doc_id") + 1_000_000_000)
                         .alias("doc_id"), "text")

    result = {"n_base": args.n, "factor": args.factor,
              "delta_docs": delta.count(), "sizes": {}}

    for label, n in (("base", args.n), ("big", args.n * args.factor)):
        path = build_corpus(spark, n, args.words_per_doc, args.s,
                            args.dup_rate,
                            args.seed + (0 if label == "base" else 1),
                            f"/tmp/guard_stats_{label}_{n}")
        docs = spark.read.parquet(f"{path}/documents.parquet")
        I.publish_ppjoin_base(spark, docs, "gsc_ppj", k=3,
                              num_buckets=8)
        I.publish_edjoin_base(spark, docs, "gsc_edj", d=10, q=8,
                              num_buckets=8)

        ops = {
            "ppjoin": lambda: I.ppjoin_increment_from_base(
                spark, delta, "gsc_ppj", t_pct=50, k=3,
                max_candidates=0),
            "containment": lambda: I.containment_increment_from_base(
                spark, delta, "gsc_ppj", c_pct=80, k=3,
                max_candidates=0),
            "edjoin": lambda: I.edjoin_increment_from_base(
                spark, delta, "gsc_edj", d=10, q=8,
                max_candidates=0),
        }
        hides = {
            "ppjoin": ["gsc_ppj_pstats"],
            "containment": ["gsc_ppj_pstats"],
            "edjoin": ["gsc_edj_chunkstats", "gsc_edj_substats",
                       "gsc_edj_tinystats"],
        }
        row: dict[str, float | int] = {"n_docs": n}
        for op, fn in ops.items():
            s_stats, b_stats = _trip_seconds_and_bound(fn)
            for t in hides[op]:
                spark.sql(f"ALTER TABLE {t} RENAME TO {t}_hidden")
            try:
                s_fb, b_fb = _trip_seconds_and_bound(fn)
            finally:
                for t in hides[op]:
                    spark.sql(f"ALTER TABLE {t}_hidden RENAME TO {t}")
            assert b_stats == b_fb, (op, label, b_stats, b_fb)
            row[f"{op}_guard_stats_s"] = s_stats
            row[f"{op}_guard_fallback_s"] = s_fb
            row[f"{op}_bound"] = b_stats
        result["sizes"][label] = row
        print(f"{label}: {row}", file=sys.stderr)

    b, g = result["sizes"]["base"], result["sizes"]["big"]
    result["guard_time_ratio_at_factor"] = {
        op: {
            "stats": round(g[f"{op}_guard_stats_s"]
                           / max(b[f"{op}_guard_stats_s"], 1e-9), 2),
            "fallback": round(g[f"{op}_guard_fallback_s"]
                              / max(b[f"{op}_guard_fallback_s"], 1e-9),
                              2),
        }
        for op in ("ppjoin", "containment", "edjoin")
    }
    out = json.dumps(result)
    if args.out == "-":
        print(out)
    else:
        Path(args.out).write_text(out + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
