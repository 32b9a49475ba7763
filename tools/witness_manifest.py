"""Maintain WITNESS_MANIFEST.json: name -> query_digest at last passing
driver witness.

Run this at round START, before any code edits — at that moment HEAD is
exactly the source the driver's latest CORRECTNESS_r*.json executed, so
"current digest" == "digest the driver witnessed".

Rules:
  * a name with a PASSING entry in the LATEST round's CORRECTNESS file
    gets its manifest digest refreshed to the current digest (the driver
    just re-witnessed this exact source);
  * a name passing only in OLDER rounds keeps its existing manifest entry
    untouched (its witness predates possible edits; refreshing it would
    launder an unwitnessed change);
  * on first adoption (no manifest yet), every passing name is seeded
    with the current digest, EXCEPT names passed via --stale, which are
    known to have changed after their last witness (round 5 changed four
    witnessed queries; the round-5 verdict requires them to re-queue).

Usage:
    python tools/witness_manifest.py [--stale name1,name2,...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MANIFEST = os.path.join(REPO, "WITNESS_MANIFEST.json")


def _passing(rec: dict) -> bool:
    return rec.get("hash_match") is True or (
        rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", default="", help="comma-separated names to drop")
    args = ap.parse_args()
    stale = {s for s in args.stale.split(",") if s}

    from odni_apache_beam_consumer_spark.plans.registry import (
        all_queries,
        query_digest,
    )

    names = set(all_queries())

    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    rounds.sort()
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json files found")

    passed_any: set[str] = set()
    for _, path in rounds:
        with open(path) as f:
            for name, rec in json.load(f).items():
                if _passing(rec):
                    passed_any.add(name)
    with open(rounds[-1][1]) as f:
        passed_latest = {n for n, rec in json.load(f).items() if _passing(rec)}

    try:
        with open(MANIFEST) as f:
            manifest: dict[str, str] = json.load(f)
        first_adoption = False
    except (OSError, ValueError):
        manifest = {}
        first_adoption = True

    for name in sorted(passed_any & names):
        if name in stale:
            manifest.pop(name, None)
            continue
        if name in passed_latest or (first_adoption and name not in manifest):
            manifest[name] = query_digest(name)

    # Drop entries for queries that no longer exist.
    manifest = {n: d for n, d in sorted(manifest.items()) if n in names}

    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"manifest: {len(manifest)} entries "
        f"({len(passed_latest & names)} refreshed from r{rounds[-1][0]:02d}, "
        f"{len(stale)} forced stale)"
    )


if __name__ == "__main__":
    main()
