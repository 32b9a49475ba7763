"""One-off migration for a query_digest FORMULA change (round 10: the
digest now folds in the transitive helper-source closure, closing the
round-9 blind spot where an operators/* refactor did not re-queue the
queries that execute it).

A naive restamp ("recompute every manifest entry with the new formula at
current HEAD") would LAUNDER any helper edit made between a query's last
driver witness and now — exactly the class of change the new formula
exists to catch.  Instead, this script recomputes each entry's digest AT
THE TREE ITS WITNESS ACTUALLY RAN: for each manifest name, find the
latest round R with a passing CORRECTNESS_rR.json entry, resolve the
commit the driver executed for round R (the parent of the "round R:
verdict/..." artifact commit), check that tree out into a temp worktree,
and compute the NEW-formula digest of the query there via a standalone
script (the old tree's registry lacks the new closure logic, so the
script carries its own copy).

After migration, a name whose helpers changed since its witness has a
manifest digest that (correctly) mismatches the current digest, so it
re-queues for a fresh driver witness; a name whose full closure is
unchanged keeps retiring.  Zero trust is extended to post-witness edits.

Usage:
    python tools/remint_manifest.py            # migrate in place
    python tools/remint_manifest.py --dry-run  # report only
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "WITNESS_MANIFEST.json")

# Standalone digest program run inside each witness tree.  Mirrors
# registry._closure_parts/query_digest; kept inline because the witness
# trees predate the new formula.
_DIGEST_PROG = r"""
import hashlib, importlib.util, json, sys
sys.path.insert(0, sys.argv[1])
from odni_apache_beam_consumer_spark.plans.registry import (
    QUERIES, ORACLES, all_queries,
)
# Load the NEW registry (current repo) under an alias: the package name is
# already bound to the witness tree's modules in sys.modules, so a plain
# import would return the old registry, which lacks _closure_parts.
spec = importlib.util.spec_from_file_location(
    "new_registry",
    {repo!r} + "/odni_apache_beam_consumer_spark/plans/registry.py",
)
new_registry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(new_registry)
_new_closure_parts = new_registry._closure_parts
all_queries()
out = {{}}
for name in json.loads(sys.argv[2]):
    if name not in QUERIES:
        continue
    parts = {{}}
    _new_closure_parts(QUERIES[name], set(), parts)
    acc = hashlib.sha256()
    for key in sorted(parts):
        acc.update(f"##{{key}}##\n".encode())
        acc.update(parts[key].encode())
    acc.update(b"\n##oracle##\n")
    acc.update(ORACLES.get(name, "").encode())
    out[name] = acc.hexdigest()[:16]
print(json.dumps(out))
"""


def _passing(rec: dict) -> bool:
    return rec.get("hash_match") is True or (
        rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
    )


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, cwd=REPO, check=True
    ).stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    # name -> latest passing round
    last_round: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name, rec in json.load(f).items():
                if _passing(rec):
                    last_round[name] = max(last_round.get(name, 0), rnd)

    # round -> executed-tree commit (parent of the verdict artifact commit)
    tree_for_round: dict[int, str] = {}
    for line in _git("log", "--all", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            rnd = int(m.group(1))
            if rnd not in tree_for_round:
                tree_for_round[rnd] = _git("rev-parse", f"{sha}^").strip()

    with open(MANIFEST) as f:
        manifest: dict[str, str] = json.load(f)

    by_round: dict[int, list[str]] = {}
    for name in manifest:
        rnd = last_round.get(name)
        if rnd is None or rnd not in tree_for_round:
            print(f"SKIP {name}: no witness round / tree resolvable")
            continue
        by_round.setdefault(rnd, []).append(name)

    new_manifest = dict(manifest)
    for rnd in sorted(by_round):
        commit = tree_for_round[rnd]
        names = by_round[rnd]
        with tempfile.TemporaryDirectory(prefix=f"remint_r{rnd}_") as wt:
            tree = os.path.join(wt, "tree")
            subprocess.run(
                ["git", "worktree", "add", "--detach", tree, commit],
                cwd=REPO, check=True, capture_output=True,
            )
            try:
                prog = _DIGEST_PROG.format(repo=REPO)
                out = subprocess.run(
                    [sys.executable, "-c", prog, tree, json.dumps(names)],
                    capture_output=True, text=True, timeout=600,
                )
                if out.returncode != 0:
                    print(f"round {rnd} tree digest FAILED:\n{out.stderr[-2000:]}")
                    continue
                digs = json.loads(out.stdout.strip().splitlines()[-1])
            finally:
                subprocess.run(
                    ["git", "worktree", "remove", "--force", tree],
                    cwd=REPO, check=False, capture_output=True,
                )
        for name in names:
            if name in digs:
                new_manifest[name] = digs[name]
            else:
                print(f"SKIP {name}: absent from round-{rnd} tree")
        print(f"round {rnd} ({commit[:8]}): restamped {len(digs)}/{len(names)}")

    changed = {n for n in manifest if manifest[n] != new_manifest[n]}
    print(f"{len(changed)} entries changed of {len(manifest)}")
    if not args.dry_run:
        with open(MANIFEST, "w") as f:
            json.dump(new_manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        print("manifest written")


if __name__ == "__main__":
    main()
