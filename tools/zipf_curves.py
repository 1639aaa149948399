"""Exact-join scaling curves on a Zipf-vocabulary corpus (VERDICT r5
stretch 9).

The measured q140/q143 curves in SURVEY §6.1b-r5 run on the driver
testdata, whose documents are word-salad over a BOUNDED vocabulary
(~985 distinct 4-grams corpus-wide at the 10× blow-up) — the
worst case for prefix filtering, since every gram's df grows linearly
with corpus size and the candidate bound Σ_g df² grows quadratically.
The operators' docstrings claim real text behaves differently: natural
corpora follow Zipf's law (token frequency ∝ 1/rank^s) with a
vocabulary that GROWS with corpus size (Heaps' law), so the rare grams
that prefix filtering joins on keep df ≈ small constants and candidate
volume stays near-linear. This tool puts a number on that claim.

Fixture: ``n`` documents of ``words_per_doc`` tokens sampled from a
Zipf(s) rank distribution over an open-ended integer vocabulary
(deterministic seed), plus ``dup_rate`` planted near-duplicates (a few
word substitutions each) so both joins return real pairs. The same
construction at 10·n gives the 10× point. For each size we record:

- the prefix-join candidate upper bound (the max_candidates guard's
  metric, measured via the guard itself with a zero budget);
- min-of-2 wall time for ppjoin_pairs (t=50, k=3) and edjoin_pairs
  (d=10, q=8), same parameters as q140/q143.

Usage: python tools/zipf_curves.py [--n 5000] [--factor 10] [--out -]
"""

from __future__ import annotations

import argparse
import json
import random
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def zipf_word(rng: random.Random, s: float, vmax: int,
              legacy_clamp: bool = False) -> str:
    """Sample a word rank via inverse-CDF on a truncated Zipf(s).

    rank = ⌊u^(-1/(s-1))⌋ (the standard power-law inverse transform
    for s>1), REJECTED and resampled when beyond ``vmax``. The r5/r6
    fixture CLAMPED instead — which at s=1.1 parks the entire
    out-of-range tail mass (~25%) on the single rank-vmax token, i.e.
    a quarter of all text became one 8-char word and every
    "rare-gram" prefix/chunk filled with runs of it. No natural
    corpus has that atom; ``--legacy-clamp`` reproduces the old
    fixture for cross-round comparability.
    """
    while True:
        u = rng.random()
        r = int(u ** (-1.0 / (s - 1.0)))
        if legacy_clamp:
            return f"w{min(max(r, 1), vmax)}"
        if 1 <= r <= vmax:
            return f"w{r}"


def build_corpus(spark, n: int, words_per_doc: int, s: float,
                 dup_rate: float, seed: int, out: str,
                 legacy_clamp: bool = False) -> str:
    rng = random.Random(seed)
    vmax = 50 * n  # vocabulary scales with corpus (Heaps-like)
    rows = []
    doc_id = 0
    while doc_id < n:
        words = [zipf_word(rng, s, vmax, legacy_clamp)
                 for _ in range(words_per_doc)]
        rows.append((doc_id, " ".join(words)))
        doc_id += 1
        if doc_id < n and rng.random() < dup_rate:
            # planted near-duplicate: substitute 2 words
            mutated = list(words)
            for _ in range(2):
                mutated[rng.randrange(len(mutated))] = zipf_word(
                    rng, s, vmax, legacy_clamp)
            rows.append((doc_id, " ".join(mutated)))
            doc_id += 1
    shutil.rmtree(out, ignore_errors=True)
    (spark.createDataFrame(rows, "doc_id long, text string")
     .repartition(8).write.parquet(f"{out}/documents.parquet"))
    return out


def measure_bound(fn, docs) -> int:
    """Run the operator's max_candidates guard with a zero budget and
    read the measured bound out of the refusal message."""
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )

    try:
        fn(docs, max_candidates=0).count()
    except CandidateVolumeExceeded as e:
        return int(str(e).split("upper bound ")[1].split(" exceeds")[0])
    return 0


def timed(fn, docs) -> float:
    fn(docs).write.format("noop").mode("overwrite").save()
    best = 9e9
    for _ in range(2):
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--words-per-doc", type=int, default=40)
    # s=1.1 puts ~7% of tokens on the rank-1 word (the English "the");
    # the inverse transform yields P(rank=r) ∝ r^-s.
    ap.add_argument("--s", type=float, default=1.1)
    ap.add_argument("--dup-rate", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--legacy-clamp", action="store_true",
                    help="reproduce the r5/r6 clamped-tail fixture")
    ap.add_argument("--increments", action="store_true",
                    help="also measure the three exact increment "
                         "operators (VERDICT r7 task 4) at a 50/50 "
                         "adversarial split and a realistic 90/10 "
                         "base/delta split")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from batch_processing_analysis_spark.operators import dedup as D
    from batch_processing_analysis_spark.session import get_spark

    spark = get_spark("zipf_curves")

    def ppjoin(docs, **kw):
        return D.ppjoin_pairs(docs, t_pct=50, k=3, **kw)

    def edjoin(docs, **kw):
        return D.edjoin_pairs(docs, d=10, q=8, **kw)

    def containment(docs, **kw):
        return D.containment_pairs(docs, c_pct=80, k=3, **kw)

    result = {"fixture": ("legacy-clamped-tail" if args.legacy_clamp
                          else "truncated-zipf-v2"),
              "n_base": args.n, "factor": args.factor,
              "zipf_s": args.s, "words_per_doc": args.words_per_doc,
              "sizes": {}}
    for label, n in (("base", args.n), ("big", args.n * args.factor)):
        path = build_corpus(spark, n, args.words_per_doc, args.s,
                            args.dup_rate, args.seed + (0 if label ==
                                                        "base" else 1),
                            f"/tmp/zipf_corpus_{label}_{n}",
                            legacy_clamp=args.legacy_clamp)
        docs = spark.read.parquet(f"{path}/documents.parquet")
        n_grams = (docs.selectExpr(
            "explode(sequence(1, greatest(length(text)-7, 0))) AS p",
            "text").selectExpr("substring(text, p, 8) AS g")
            .distinct().count())
        row = {
            "n_docs": n,
            "distinct_8grams": n_grams,
            "ppjoin_bound": measure_bound(ppjoin, docs),
            "edjoin_bound": measure_bound(edjoin, docs),
            "containment_bound": measure_bound(containment, docs),
            "ppjoin_s": timed(ppjoin, docs),
            "edjoin_s": timed(edjoin, docs),
            "containment_s": timed(containment, docs),
            "ppjoin_pairs": ppjoin(docs).count(),
            "edjoin_pairs": edjoin(docs).count(),
            "containment_pairs": containment(docs).count(),
        }
        if args.increments:
            from batch_processing_analysis_spark.operators import (
                incremental as I,
            )
            from pyspark.sql import functions as F

            inc_ops = {
                "ppjoin_inc": lambda b, d, **kw:
                    I.ppjoin_increment_pairs(b, d, t_pct=50, k=3, **kw),
                "containment_inc": lambda b, d, **kw:
                    I.containment_increment_pairs(b, d, c_pct=80, k=3,
                                                  **kw),
                "edjoin_inc": lambda b, d, **kw:
                    I.edjoin_increment_pairs(b, d, d=10, q=8, **kw),
            }
            for split_label, pred in (
                ("50_50", F.col("doc_id") % 2 == 1),
                ("90_10", F.col("doc_id") % 10 == 9),
            ):
                base = docs.filter(~pred)
                delta = docs.filter(pred)
                for op_name, op in inc_ops.items():
                    key = f"{op_name}_{split_label}"
                    row[f"{key}_bound"] = measure_bound(
                        lambda dd, **kw: op(base, delta, **kw), docs)
                    row[f"{key}_s"] = timed(
                        lambda dd: op(base, delta), docs)
        result["sizes"][label] = row
        print(f"{label}: {row}", file=sys.stderr)

    b, g = result["sizes"]["base"], result["sizes"]["big"]
    result["ratios"] = {
        "ppjoin_bound": round(g["ppjoin_bound"] / max(b["ppjoin_bound"], 1), 2),
        "edjoin_bound": round(g["edjoin_bound"] / max(b["edjoin_bound"], 1), 2),
        "containment_bound": round(
            g["containment_bound"] / max(b["containment_bound"], 1), 2),
        "ppjoin_time": round(g["ppjoin_s"] / max(b["ppjoin_s"], 1e-9), 2),
        "edjoin_time": round(g["edjoin_s"] / max(b["edjoin_s"], 1e-9), 2),
        "containment_time": round(
            g["containment_s"] / max(b["containment_s"], 1e-9), 2),
    }
    if args.increments:
        for op_name in ("ppjoin_inc", "containment_inc", "edjoin_inc"):
            for split_label in ("50_50", "90_10"):
                key = f"{op_name}_{split_label}"
                result["ratios"][f"{key}_bound"] = round(
                    g[f"{key}_bound"] / max(b[f"{key}_bound"], 1), 2)
                result["ratios"][f"{key}_time"] = round(
                    g[f"{key}_s"] / max(b[f"{key}_s"], 1e-9), 2)
    text = json.dumps(result, indent=2)
    if args.out == "-":
        print(text)
    else:
        Path(args.out).write_text(text + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
