"""Driver-window rotation helper.

Reads every CORRECTNESS_r*.json in the repo root, reports which
registered queries have (ever) earned a driver-green row — hash match,
or a rows-only row for a no-oracle query — and which have not, then
checks the current ``registry.PRIMARY_ROTATION`` (or flag-based split)
against that history:

- queries never driver-checked that are NOT in the current primary
  window (candidates for the next rotation);
- primaries that are already green in 2+ rounds (slots that could be
  ceded).

Usage: python tools/rotation_check.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_canary,
        queries_eventlog,
        queries_relational,
        queries_text,
    )

    green_rounds: dict[str, list[str]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        data = json.loads(path.read_text())
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or row.get("err") == "no_oracle":
                green_rounds.setdefault(name, []).append(path.stem)

    registered = sorted(set(registry.QUERIES) | set(registry.EXTRA_QUERIES))
    primary = set(registry.QUERIES)
    never = [n for n in registered if n not in green_rounds]

    print(f"{len(registered)} registered; {len(primary)} primary; "
          f"{len(green_rounds)} ever driver-green; {len(never)} never")
    missing_from_window = [n for n in never if n not in primary]
    if missing_from_window:
        print("\nNEVER GREEN and not in the current window "
              "(rotate these in next):")
        for n in missing_from_window:
            print(f"  {n}")
    else:
        print("\nEvery never-green query is already in the current window.")
    cedable = sorted(
        n for n in primary if len(green_rounds.get(n, [])) >= 2
    )
    if cedable:
        print(f"\nPrimaries green in 2+ rounds (cedable slots): {len(cedable)}")
        for n in cedable:
            print(f"  {n}  ({', '.join(green_rounds[n])})")


if __name__ == "__main__":
    main()
