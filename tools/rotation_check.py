"""Driver-window rotation gate with a staleness budget (two modes).

Reads every CORRECTNESS_r*.json in the repo root, computes per-query
driver-green history (hash match, or a rows-only row for a no-oracle
query), and checks it against ``registry.PRIMARY_ROTATION``.

Two unambiguous modes (VERDICT r6 task 1d — the old single mode
conflated "round N closed clean" with "round N+1 window planned"):

``--close``  Gate the FINISHED round: every registered, non-allowlisted
             query's newest driver green must be at most ``budget``
             rounds old *at the newest recorded round* (age =
             newest_round - latest_green <= budget), and every
             never-green query must sit in the current window (so the
             record is on track to cover it). Run this to certify a
             round's record.

``--plan``   Gate the NEXT round's window: at planning round
             (newest_round + 1), any unscheduled query whose age
             exceeds the budget is a violation, any never-green query
             outside the window is a violation, and the "coming due"
             list is printed as the input for building the next
             rotation. Run this after editing PRIMARY_ROTATION.

Default (no flag): run both; exit nonzero if either fails.
``tools/release_check.py`` runs the two modes as separate labeled
steps.

Budget arithmetic (VERDICT r6 task 1a): 160+ registered queries minus
the 8 allowlisted environment canaries = 152+ budget-tracked queries
over a 50-slot driver window -> a 152/50 = 3.04-round refresh period is
the feasibility floor, so a 3-round budget is structurally
unsatisfiable and the default budget is **4** (capacity 50 x 4 = 200
query-greens per budget period >= tracked queries, with headroom for
~45 future registrations).

Allowlisted from the budget (VERDICT r6 task 1b): the driver-
environment canaries. They exist to probe the driver's DuckDB/pandas
canonicalization (DRIVER_ENV.md), their diagnostic value is the round
they first ran, and one (q116) is red by design — re-greening them on a
cadence would burn window slots on environment probes, not operators.

Usage: python tools/rotation_check.py [--close|--plan] [--budget 4]
Exit status: 0 = gates green, 1 = violations.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Environment canaries (DRIVER_ENV.md): q116 is the designed-red
# HUGEINT probe; the rest greened once in r5, which is the whole point
# of a probe. None of them exercises an engine operator.
BUDGET_ALLOWLIST = {
    "q111_canary_float_round",
    "q112_canary_regex_split",
    "q113_canary_json_extract",
    "q114_canary_hex_cast",
    "q115_canary_nullable_agg",
    "q116_canary_hugeint_probe",
    "q117_canary_unicode_lower",
    "q122_canary_pow",
}

DEFAULT_BUDGET = 4


def load_history() -> tuple[dict[str, list[int]], int]:
    """name → sorted green rounds, and the newest recorded round."""
    greens: dict[str, list[int]] = {}
    newest = 0
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        newest = max(newest, rnd)
        data = json.loads(path.read_text())
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or row.get("err") == "no_oracle":
                greens.setdefault(name, []).append(rnd)
    return {n: sorted(rs) for n, rs in greens.items()}, newest


def _load_registry():
    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_canary,
        queries_eventlog,
        queries_relational,
        queries_text,
    )

    return registry


def check_close(budget: int) -> int:
    """Gate the finished round's record. Returns count of violations."""
    registry = _load_registry()
    greens, newest = load_history()
    registered = sorted(set(registry.QUERIES) | set(registry.EXTRA_QUERIES))
    primary = set(registry.QUERIES)

    stale = []
    never_uncovered = []
    for n in registered:
        if n in BUDGET_ALLOWLIST:
            continue
        if n not in greens:
            # brand-new query: close passes as long as the window will
            # cover it (the plan gate owns scheduling)
            if n not in primary:
                never_uncovered.append(n)
            continue
        age = newest - max(greens[n])
        if age > budget:
            stale.append((n, max(greens[n])))

    print(f"[close] record through r{newest}: {len(registered)} registered, "
          f"{len(greens)} ever green, budget {budget}")
    if stale:
        print(f"[close] STALE AT ROUND CLOSE ({len(stale)}): newest green "
              f"> {budget} rounds old at r{newest}:")
        for n, latest in stale:
            print(f"  {n}  (newest green r{latest})")
    if never_uncovered:
        print(f"[close] NEVER GREEN and not in the current window "
              f"({len(never_uncovered)}):")
        for n in never_uncovered:
            print(f"  {n}")
    if not stale and not never_uncovered:
        print(f"[close] OK — every tracked query green within {budget} "
              f"rounds of r{newest}; all never-greens scheduled.")
    return len(stale) + len(never_uncovered)


def check_plan(budget: int) -> int:
    """Gate the next round's window. Returns count of violations."""
    registry = _load_registry()
    greens, newest = load_history()
    planning_round = newest + 1
    registered = sorted(set(registry.QUERIES) | set(registry.EXTRA_QUERIES))
    primary = set(registry.QUERIES)
    never = [n for n in registered if n not in greens]

    print(f"[plan] {len(registered)} registered; {len(primary)} in window; "
          f"{len(greens)} ever green; {len(never)} never; planning "
          f"r{planning_round}, budget {budget}")

    missing_from_window = [
        n for n in never
        if n not in primary and n not in BUDGET_ALLOWLIST
    ]
    if missing_from_window:
        print(f"[plan] NEVER GREEN and not in the window — rotate these in "
              f"({len(missing_from_window)}):")
        for n in missing_from_window:
            print(f"  {n}")
    else:
        print("[plan] every never-green query is in the window or "
              "allowlisted.")

    violations = []
    coming_due = []
    for n in registered:
        if n in BUDGET_ALLOWLIST or n in primary:
            continue
        latest = max(greens.get(n, [0]))
        age = planning_round - latest
        if age > budget:
            violations.append((n, latest))
        elif age == budget:
            coming_due.append((n, latest))
    if violations:
        print(f"[plan] STALENESS BUDGET VIOLATIONS ({len(violations)}): "
              f"newest green > {budget} rounds old at r{planning_round} and "
              f"not in the window:")
        for n, latest in violations:
            print(f"  {n}  (newest green r{latest})")
    else:
        print(f"[plan] staleness budget OK (every unscheduled query has a "
              f"green within {budget} rounds).")
    if coming_due:
        print(f"[plan] coming due next round ({len(coming_due)}) — build "
              f"the NEXT rotation from these:")
        for n, latest in coming_due:
            print(f"  {n}  (newest green r{latest})")

    cedable = sorted(n for n in primary if len(greens.get(n, [])) >= 2)
    if cedable:
        print(f"[plan] window queries already green in 2+ rounds (cedable "
              f"slots): {len(cedable)}")
    return len(violations) + len(missing_from_window)


def main() -> int:
    parser = argparse.ArgumentParser()
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument("--close", action="store_true",
                      help="gate the finished round's record")
    mode.add_argument("--plan", action="store_true",
                      help="gate the next round's window")
    parser.add_argument("--budget", type=int, default=DEFAULT_BUDGET,
                        help=f"max rounds since newest green "
                             f"(default {DEFAULT_BUDGET}; see module "
                             f"docstring for the feasibility arithmetic)")
    args = parser.parse_args()

    bad = 0
    if args.close or not args.plan:
        bad += check_close(args.budget)
    if args.plan or not args.close:
        if not args.plan:
            print()
        bad += check_plan(args.budget)
    return 1 if bad else 0


if __name__ == "__main__":
    # Compute the exit status BEFORE printing can raise BrokenPipeError
    # (ADVICE r6: piping into `head` must not convert a violation exit
    # into 0).
    try:
        status = main()
    except BrokenPipeError:
        status = 1
    try:
        sys.stdout.flush()
    except BrokenPipeError:
        pass
    raise SystemExit(status)
