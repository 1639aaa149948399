"""One pinned per-round verification command (VERDICT r5 task 7).

Runs, in order, the three gates that together constitute the local
release bar, and fails on the first nonzero exit:

1. ``python -m pytest tests/ -q``            (unit/parity/property suite)
2. ``python tools/verify_queries.py --extra --strict-driver``
                                             (all registered queries vs
                                             DuckDB, driver-emulating
                                             canonicalization)
3. ``python tools/rotation_check.py --close`` (the finished round's
                                             record is within budget)
4. ``python tools/rotation_check.py --plan``  (the next round's window
                                             covers violations +
                                             never-greens)

Usage:
    python tools/release_check.py [--fast]

``--fast`` skips pytest (for mid-build re-checks of the oracle gate
only; a closing-round run must be full).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str]) -> None:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, cwd=REPO)
    dt = time.time() - t0
    if rc != 0:
        print(f"=== {label} FAILED (exit {rc}) after {dt:.0f}s")
        sys.exit(rc)
    print(f"=== {label} OK ({dt:.0f}s)")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true",
                        help="skip the pytest suite")
    args = parser.parse_args()

    if not args.fast:
        run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    run("oracle gate", [sys.executable, "tools/verify_queries.py",
                        "--extra", "--strict-driver"])
    run("rotation (round close)",
        [sys.executable, "tools/rotation_check.py", "--close"])
    run("rotation (next window plan)",
        [sys.executable, "tools/rotation_check.py", "--plan"])
    print("\nrelease_check: ALL GATES GREEN")


if __name__ == "__main__":
    main()
