"""Bound-derived join sizing, proven at capped memory (VERDICT r8
task 3 "done" criterion): the sf10 edit-distance completions needed a
hand-tuned 64 g / 256-partition session even though the guard had
already measured the exact candidate bound. The r9 operators derive
the candidate/verify exchange partition count from that bound
(dedup.sized_partitions_for_bound). This tool is the scaled-down
pytest-style equivalent of the sf10 run: a subprocess with a SMALL
driver heap and a SMALL shuffle-partition session executes the same
under-ceiling edjoin twice —

- ``legacy``: sizing disabled (GUARD_JOIN_ROWS_PER_PARTITION patched
  to infinity → the r8 plan shape, bound ignored);
- ``auto``: the r9 default (bound-derived partitions).

Expected signature at a heap the workload outsizes: ``legacy`` dies
(SparkOutOfMemoryError / executor failure) where ``auto`` completes
with the same pair count. If BOTH complete, raise --n until the
working set outgrows the heap; record whichever outcome is measured.

Corpus: bounded-vocabulary word salad (the driver-testdata regime that
made sf10 superlinear) — few distinct grams, so the candidate bound is
huge relative to the doc count and the join's working set dwarfs the
corpus itself.

Usage: python tools/bound_sizing_check.py [--n 20000] [--mem 1g]
       [--partitions 8] [--out BOUND_SIZING_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys, time
mode, n, parts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", str(parts))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
sys.path.insert(0, %(repo)r)
from batch_processing_analysis_spark.operators import dedup as D
if mode == "legacy":
    D.GUARD_JOIN_ROWS_PER_PARTITION = 10**18  # never resize (r8 shape)
import random
rng = random.Random(11)
VOCAB = [f"w{i}" for i in range(40)]  # bounded vocabulary: huge bound
rows = [(i, " ".join(rng.choice(VOCAB) for _ in range(12)))
        for i in range(n)]
docs = spark.createDataFrame(rows, "doc_id long, text string") \
    .repartition(8).localCheckpoint(eager=True)
t0 = time.time()
out = D.edjoin_pairs(docs, d=6, q=3, max_candidates=10**12)
cnt = out.count()
print(f"RESULT mode={mode} pairs={cnt} secs={time.time()-t0:.1f}",
      flush=True)
"""


def run_mode(mode: str, n: int, mem: str, parts: int,
             timeout_s: int) -> dict:
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-memory {mem} pyspark-shell")
    script = RUNNER % {"repo": str(REPO)}
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", script, mode, str(n), str(parts)],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        tail = "\n".join((p.stdout + p.stderr).splitlines()[-30:])
        result_line = next((ln for ln in p.stdout.splitlines()
                            if ln.startswith("RESULT")), None)
        oom = ("OutOfMemoryError" in p.stdout + p.stderr
               or "SparkOutOfMemoryError" in p.stdout + p.stderr)
        return {"completed": p.returncode == 0 and result_line is not None,
                "returncode": p.returncode, "oom_signature": oom,
                "result": result_line,
                "wall_s": round(time.time() - t0, 1),
                "tail": tail if p.returncode != 0 else None}
    except subprocess.TimeoutExpired:
        return {"completed": False, "returncode": None,
                "oom_signature": False, "result": None,
                "wall_s": round(time.time() - t0, 1),
                "tail": f"TIMEOUT after {timeout_s}s"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--mem", default="1g")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--modes", default="legacy,auto")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    result = {"n_docs": args.n, "driver_memory": args.mem,
              "shuffle_partitions": args.partitions, "modes": {}}
    for mode in args.modes.split(","):
        print(f"running {mode} (n={args.n}, mem={args.mem}, "
              f"partitions={args.partitions})...", file=sys.stderr)
        result["modes"][mode] = run_mode(mode, args.n, args.mem,
                                         args.partitions, args.timeout)
        print(f"  -> {result['modes'][mode]}", file=sys.stderr)
    out = json.dumps(result)
    if args.out == "-":
        print(out)
    else:
        Path(args.out).write_text(out + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
