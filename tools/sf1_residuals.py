"""Re-measure the r9 sf1 residuals under the control-set protocol
(VERDICT r9 task 4 "done" criterion): q94_distinctive_terms (0.80 →
2.03 s between r7 and r9), q42_dedup_simhash (2.32 → 4.36 s) and
q162_jaccard_threshold_profile (15.0 → 23.3 s) were carried forward
as "likely host drift" without a normalizer. This tool measures the
bench CONTROL_SET and the three residuals solo on the sf1-equivalent
blow-up, then reports each residual's ratio to its BENCH_sf1_r09 row
BOTH raw and divided by the control ratio (median control row vs ITS
r9 record) — a residual whose control-normalized ratio is ~1 is host
drift, settled; one that stays >1.5 after normalization is a real
regression to fix.

Usage: python tools/sf1_residuals.py [--out SF1_RESIDUALS_r10.json]
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

from bench import CONTROL_SET  # noqa: E402
from scaling_curves import build_blowup  # noqa: E402

RESIDUALS = [
    "q94_distinctive_terms",
    "q42_dedup_simhash",
    "q162_jaccard_threshold_profile",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_eventlog,
        queries_relational,
        queries_text,
    )
    from batch_processing_analysis_spark.session import get_spark

    prev = json.loads(
        (REPO / "BENCH_sf1_r09.json").read_text().splitlines()[0])
    prev_q = prev["queries"]

    spark = get_spark("sf1_residuals")
    allq = {**registry.QUERIES, **registry.EXTRA_QUERIES}
    sf_dir = build_blowup(spark, "/root/testdata/sf0.1", 10, full=True)

    def timed(name: str) -> float:
        fn = allq[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = 9e9
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    controls = {}
    for name in CONTROL_SET:
        controls[name] = timed(name)
        print(f"control {name}: {controls[name]} s "
              f"(r9: {prev_q.get(name)})", file=sys.stderr)
    ratios = sorted(
        controls[n] / prev_q[n] for n in controls
        if isinstance(prev_q.get(n), (int, float)) and prev_q[n] > 0)
    mid = len(ratios) // 2
    control_ratio = (ratios[mid] if len(ratios) % 2
                     else (ratios[mid - 1] + ratios[mid]) / 2)
    print(f"control median ratio vs r9 board: {control_ratio:.3f}",
          file=sys.stderr)

    rows = {}
    for name in RESIDUALS:
        now = timed(name)
        r9 = prev_q[name]
        raw = now / r9
        rows[name] = {
            "r9_s": r9, "now_s": now, "raw_ratio": round(raw, 2),
            "control_normalized_ratio": round(raw / control_ratio, 2),
        }
        print(f"{name}: {rows[name]}", file=sys.stderr)

    result = {
        "protocol": f"solo, warm-up + min-of-{args.reps}, "
                    "sf1-equivalent blow-up of sf0.1",
        "controls_now_s": controls,
        "control_median_ratio_vs_r9": round(control_ratio, 3),
        "residuals": rows,
        "verdict_rule": "control-normalized ~1 => host drift, settled; "
                        ">1.5 => real regression",
    }
    text = json.dumps(result, indent=1)
    if args.out == "-":
        print(text)
    else:
        Path(args.out).write_text(text + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
