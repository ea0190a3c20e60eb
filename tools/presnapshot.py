#!/usr/bin/env python
"""Pre-snapshot checklist: refuse a sidecar-refresh commit while the suite is red.

Round-4 shipped a bench_results.json that violated its own schema test
(tests/test_bench_schema.py — all-5 CAM latency below single-class) because
the refresh commit went in without re-running pytest (VERDICT r4 weak #1 /
next-round item 1).  This script is the gate: run it after `python bench.py
--full` and BEFORE `git commit` of any sidecar refresh.

    python tools/presnapshot.py            # full suite (~12 min warm, 1-core box)
    python tools/presnapshot.py --fast     # schema/sidecar-facing tests only

Exit code 0 = safe to commit the refreshed sidecar; anything else = fix first.
No reference-equivalent: the reference has no tests at all (SURVEY.md §4).
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The tests that read the committed sidecar or bench helpers directly — the
# minimum bar for a sidecar-refresh commit.  --fast runs only these; the
# default runs the whole suite.
SIDECAR_FACING = [
    "tests/test_bench_schema.py",
    "tests/test_bench_failure.py",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--fast", action="store_true",
                    help="run only the sidecar-facing tests")
    args = ap.parse_args()

    targets = [t for t in SIDECAR_FACING if os.path.exists(os.path.join(HERE, t))] \
        if args.fast else ["tests/"]
    cmd = [sys.executable, "-m", "pytest", *targets, "-q"]
    print(f"[presnapshot] {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=HERE)
    if rc == 0:
        print("[presnapshot] GREEN — sidecar refresh is safe to commit.")
    else:
        print(f"[presnapshot] RED (pytest rc {rc}) — do NOT commit the "
              "sidecar; fix the suite first.", file=sys.stderr)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
