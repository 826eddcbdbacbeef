#!/usr/bin/env python
"""Run a test tier and stamp the result into artifacts/tests_green.json.

The verification ladder (VERDICT r2 #6): every perf-sensitive commit should
be able to prove its exactness gates ran. This script runs one tier via
dev/run_tests.sh, parses the pytest summary, and records
{tier, sha, dirty, passed/failed/skipped, seconds, utc} — appending to the
per-tier map so the newest green run of each tier is always visible.

Usage:  python dev/stamp_tests_green.py [fast|medium|slow|all]
        python dev/stamp_tests_green.py --check [tiers...]

Stamp discipline (VERDICT r3 #6 — rounds 2 and 3 both shipped hot-path
edits made AFTER the last stamp, and round 2 shipped broken because of
it): stamping a DIRTY tree is refused (the stamp would attest a state no
commit can reproduce) unless --allow-dirty is given. ``--check`` verifies
that every named tier (default: fast, medium) is stamped green AT HEAD of
a clean tree — run it as the final gate before ending a round.
"""
import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git(*args):
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True).stdout.strip()


# The stamp file itself is tracked, so writing one stamp would otherwise
# dirty the tree and block stamping the next tier; the dirty computation
# everywhere below is "dirty ignoring the stamp file and the driver's
# progress log" — the stamp attests the CODE state, not bookkeeping
# (PROGRESS.jsonl is appended by the round driver every ~15 min, which
# would spuriously dirty any stamp run longer than that).
STAMP_REL = "artifacts/tests_green.json"
_IGNORED = (STAMP_REL, "PROGRESS.jsonl")


def code_dirty():
    return bool(git("status", "--porcelain", "-uno", "--",
                    ".", *[f":!{p}" for p in _IGNORED]))


def check(tiers):
    """Fail unless every tier is stamped green at HEAD of a clean tree.

    A stamp made at HEAD~1 also passes IF the only commit on top is the
    stamp-file commit itself (the unavoidable 'commit the stamps' step)."""
    path = os.path.join(ROOT, STAMP_REL)
    head = git("rev-parse", "HEAD")
    parent = git("rev-parse", "HEAD~1")
    top_files = set(
        git("diff", "--name-only", "HEAD~1", "HEAD").strip().splitlines())
    head_is_stamp_only = bool(top_files) and top_files <= set(_IGNORED)
    with open(path) as f:
        data = json.load(f)
    bad = []
    if code_dirty():
        bad.append("working tree is dirty (beyond the stamp file)")
    for tier in tiers:
        s = data.get(tier)
        if s is None:
            bad.append(f"{tier}: never stamped")
        elif not s["green"]:
            bad.append(f"{tier}: stamped NOT green at {s['sha'][:9]}")
        elif s["dirty"]:
            bad.append(f"{tier}: stamped on a dirty tree at {s['sha'][:9]}")
        elif s["sha"] != head and not (
                s["sha"] == parent and head_is_stamp_only):
            bad.append(f"{tier}: stamped at {s['sha'][:9]}, HEAD is "
                       f"{head[:9]} — re-run `python dev/stamp_tests_green"
                       f".py {tier}`")
    if bad:
        for b in bad:
            print(f"STAMP CHECK FAILED: {b}")
        sys.exit(1)
    print(f"stamp check ok at {head[:9]}: {', '.join(tiers)} green")
    sys.exit(0)


def main():
    args = [a for a in sys.argv[1:] if a != "--allow-dirty"]
    allow_dirty = "--allow-dirty" in sys.argv
    if args and args[0] == "--check":
        check(args[1:] or ["fast", "medium"])
    tier = args[0] if args else "fast"
    if not allow_dirty and code_dirty():
        print("REFUSING to stamp a dirty tree (the stamp would attest a "
              "state no commit reproduces); commit first or pass "
              "--allow-dirty for a throwaway run.")
        sys.exit(1)
    t0 = time.time()
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "dev", "run_tests.sh"), tier],
        capture_output=True, text=True,
    )
    dt = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    sys.stdout.write(tail + "\n")

    counts = dict(passed=0, failed=0, skipped=0, deselected=0, error=0)
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped|deselected|error)",
                              proc.stdout):
        counts[kind] = int(n)
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    dirty = code_dirty()
    stamp = {
        "sha": sha,
        "dirty": dirty,
        "green": proc.returncode == 0 and counts["failed"] == 0
        and counts["error"] == 0,
        "seconds": round(dt, 1),
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        **counts,
    }
    path = os.path.join(ROOT, "artifacts", "tests_green.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[tier] = stamp
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"stamped {tier}: {stamp}")
    sys.exit(0 if stamp["green"] else 1)


if __name__ == "__main__":
    main()
