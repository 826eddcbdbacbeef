#!/usr/bin/env python
"""Run a test tier and stamp the result into artifacts/tests_green.json.

The verification ladder (VERDICT r2 #6): every perf-sensitive commit should
be able to prove its exactness gates ran. This script runs one tier via
dev/run_tests.sh, parses the pytest summary, and records
{tier, sha, dirty, passed/failed/skipped, seconds, utc} — appending to the
per-tier map so the newest green run of each tier is always visible.

Usage:  python dev/stamp_tests_green.py [fast|medium|slow|all]
"""
import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "fast"
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
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain", "-uno"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip())
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
