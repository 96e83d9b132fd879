"""End-of-round snapshot gate (r6 VERDICT asks 1 + 7).

ONE command that refuses to bless a snapshot unless the repo is fully
green at HEAD:

    python tools/gate.py            # full gate: pytest + 180-entry oracle
    python tools/gate.py --quick    # oracle only (the nightly freshness run)

Steps (each must exit 0, any failure fails the gate):

1. ``python -m pytest tests/ -q``           — the whole unit/plan suite
   (round 6 shipped with one red test because this wasn't a
   precondition; now it is).
2. ``python tools/check_correctness.py``    — EVERY catalog entry vs its
   DuckDB oracle at $SPARK_GRAFT_TEST_SF_DIR (driver-identical compare:
   rows + schema + value hash). Any entry that errs or mismatches
   fails the gate — this is the "evidence freshness" run the judge
   previously re-derived by hand.

Exit-code contract: 0 = safe to snapshot/commit the round; 1 = at least
one step failed (its output is streamed through); 2 = usage error.
Steps run sequentially, fail-fast, output unbuffered.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    print(f"\n=== gate: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.monotonic()
    rc = subprocess.call(cmd, cwd=ROOT)
    dt = time.monotonic() - t0
    status = "OK" if rc == 0 else f"FAILED (exit {rc})"
    print(f"=== gate: {label}: {status} in {dt:.0f}s", flush=True)
    return rc == 0


def main(argv: list[str]) -> int:
    quick = "--quick" in argv
    unknown = [a for a in argv if a not in ("--quick",)]
    if unknown:
        print(f"usage: gate.py [--quick]  (unknown: {unknown})",
              file=sys.stderr)
        return 2
    steps = []
    if not quick:
        steps.append(("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]))
    steps.append((
        "oracle",
        [sys.executable, os.path.join(ROOT, "tools", "check_correctness.py")],
    ))
    for label, cmd in steps:
        if not run(label, cmd):
            print(f"\nGATE RED: {label} failed — do NOT snapshot this tree.",
                  flush=True)
            return 1
    what = "full oracle" if quick else "full pytest + full oracle"
    print(f"\nGATE GREEN: {what} is clean at HEAD.", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
