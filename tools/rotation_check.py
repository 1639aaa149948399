"""Driver-window rotation helper with a staleness budget.

Reads every CORRECTNESS_r*.json in the repo root, reports which
registered queries have (ever) earned a driver-green row — hash match,
or a rows-only row for a no-oracle query — and which have not, then
checks the current ``registry.PRIMARY_ROTATION`` (or flag-based split)
against that history:

- queries never driver-checked that are NOT in the current primary
  window (candidates for the next rotation);
- primaries that are already green in 2+ rounds (slots that could be
  ceded);
- **staleness budget** (VERDICT r5 task 3): every query's newest
  driver-green row must be at most ``--budget`` rounds old at the
  planning round (newest CORRECTNESS round + 1). A query older than
  the budget that is NOT scheduled in the current window is a
  violation and the script exits nonzero. 144 queries / 50 window
  slots make a 3-round refresh period the feasibility floor, so the
  default budget is 3.

Allowlisted from the budget: ``q116_canary_hugeint_probe`` (the
designed HUGEINT driver probe — its red row is the expected outcome,
re-greening it is impossible by construction; DRIVER_ENV.md).

Usage: python tools/rotation_check.py [--budget 3]
Exit status: 0 = within budget, 1 = violations.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUDGET_ALLOWLIST = {"q116_canary_hugeint_probe"}


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


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--budget", type=int, default=3,
                        help="max rounds since newest green (default 3)")
    args = parser.parse_args()

    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_canary,
        queries_eventlog,
        queries_relational,
        queries_text,
    )

    greens, newest_round = load_history()
    planning_round = newest_round + 1

    registered = sorted(set(registry.QUERIES) | set(registry.EXTRA_QUERIES))
    primary = set(registry.QUERIES)
    never = [n for n in registered if n not in greens]

    print(f"{len(registered)} registered; {len(primary)} primary; "
          f"{len(greens)} ever driver-green; {len(never)} never; "
          f"planning round r{planning_round}, budget {args.budget}")

    missing_from_window = [
        n for n in never
        if n not in primary and n not in BUDGET_ALLOWLIST
    ]
    if missing_from_window:
        print("\nNEVER GREEN and not in the current window "
              "(rotate these in next):")
        for n in missing_from_window:
            print(f"  {n}")
    else:
        print("\nEvery never-green query is in the current window "
              "or allowlisted.")

    # Staleness budget: newest green + budget must reach the planning
    # round, OR the query is scheduled in the current window (about to
    # earn a fresh row).
    violations = []
    coming_due = []
    for n in registered:
        if n in BUDGET_ALLOWLIST or n in primary:
            continue
        latest = max(greens.get(n, [0]))
        age = planning_round - latest
        if age > args.budget:
            violations.append((n, latest))
        elif age == args.budget:
            coming_due.append((n, latest))
    if violations:
        print(f"\nSTALENESS BUDGET VIOLATIONS ({len(violations)}): newest "
              f"green > {args.budget} rounds old and not in the window:")
        for n, latest in violations:
            print(f"  {n}  (newest green r{latest})")
    else:
        print("\nStaleness budget: OK (every unscheduled query has a "
              f"green row within {args.budget} rounds).")
    if coming_due:
        print(f"\nComing due next round ({len(coming_due)}) — plan the "
              "next rotation from these:")
        for n, latest in coming_due:
            print(f"  {n}  (newest green r{latest})")

    cedable = sorted(n for n in primary if len(greens.get(n, [])) >= 2)
    if cedable:
        print(f"\nPrimaries green in 2+ rounds (cedable slots): "
              f"{len(cedable)}")
        for n in cedable:
            rounds = ", ".join(f"r{r}" for r in greens[n])
            print(f"  {n}  ({rounds})")
    return 1 if (violations or missing_from_window) else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # e.g. piped into head
        raise SystemExit(0)
