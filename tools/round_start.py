"""Round-start checklist — run this FIRST THING each round, before any
code edit.

Rounds 11, 12, and 13 each began with the same procedural red test:
the driver drops CORRECTNESS_r{N}.json after code freeze, so queries
the driver just witnessed green have no manifest digest until
tools/witness_manifest.py refreshes them.  witness_manifest's refresh
rule ("names passing in the LATEST round get the CURRENT digest") is
only sound while HEAD is exactly the tree the driver executed — which
is true precisely at round start and stops being true after the first
edit.  This wrapper enforces that window instead of trusting memory:

  1. refuses to run if the working tree is dirty (post-edit digests
     would be laundered in as witnessed);
  2. runs tools/witness_manifest.py (banks the new witnesses);
  3. runs tests/test_registry.py as the green gate.

Usage:
    python tools/round_start.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dirty = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    if dirty:
        print(
            "REFUSING: working tree is dirty — witness_manifest must run"
            " on the exact tree the driver witnessed (round start,"
            " before any edit).  Commit/stash first, or if the round is"
            " already underway, do NOT run this (it would stamp"
            " unwitnessed digests as witnessed).",
            file=sys.stderr,
        )
        print(dirty, file=sys.stderr)
        return 1
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "witness_manifest.py")]
    ).returncode
    if rc != 0:
        return rc
    return subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            os.path.join(REPO, "tests", "test_registry.py"),
            "-q",
        ]
    ).returncode


if __name__ == "__main__":
    raise SystemExit(main())
