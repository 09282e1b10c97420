"""Automatic bench triage: find >1.5x round-over-round movers and A/B them.

Closes the r10 verdict's Next #4 end to end: after a bench run, this
reads the previous round's official BENCH_r{N}.json and the new bench
JSON, lists every common query whose min moved by more than the
threshold in either direction, and (unless --no-ab) immediately runs
scripts/regression_ab.py on the regressing ones against a given
baseline rev — so the code-vs-host discrimination happens in the same
session that produced the number, before PERF.md attributes anything.

Usage:
  python bench.py > /tmp/bench_new.json
  python scripts/bench_triage.py /tmp/bench_new.json \
      [--prev BENCH_r10.json] [--threshold 1.5] \
      [--rev <prev-round-rev>] [--no-ab]

Exit 0 = no regressing movers, or all movers A/B'd at ratio <= 1.2
(host noise); exit 1 = at least one mover's A/B confirms a real
regression (ratio > 1.2) or --no-ab left movers untriaged.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc:  # driver-recorded BENCH_r*.json shape
        doc = doc["parsed"]
    if "queries" not in doc:  # raw bench.py stdout (maybe multi-line)
        raise SystemExit(f"{path}: no 'queries' key")
    return doc["queries"]


def _latest_official() -> str:
    rounds = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if not rounds:
        raise SystemExit("no BENCH_r*.json found; pass --prev")
    return rounds[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new", help="new bench JSON (bench.py output)")
    ap.add_argument("--prev", default=None, help="previous official BENCH_r*.json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--rev",
        default=None,
        help="baseline rev for the A/B (default: last round's recorded commit, "
        "detected as the commit that added --prev)",
    )
    ap.add_argument("--no-ab", action="store_true", help="list movers only")
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    prev_path = args.prev or _latest_official()
    prev, new = _load_queries(prev_path), _load_queries(args.new)
    common = sorted(set(prev) & set(new))
    up, down = [], []
    for n in common:
        if not prev[n]:
            continue
        r = new[n] / prev[n]
        if r > args.threshold:
            up.append((n, prev[n], new[n], round(r, 2)))
        elif r < 1.0 / args.threshold:
            down.append((n, prev[n], new[n], round(r, 2)))
    for n, a, b, r in down:
        print(f"IMPROVED {n}: {a} -> {b} ({r}x)")
    if not up:
        print(f"no >={args.threshold}x regressing movers across {len(common)} common queries")
        return 0
    for n, a, b, r in up:
        print(f"MOVER {n}: {a} -> {b} ({r}x)")
    if args.no_ab:
        print("movers left untriaged (--no-ab); A/B them before attributing")
        return 1

    rev = args.rev
    if rev is None:
        # the commit that recorded the previous round's bench is the last
        # rev whose code produced that official number
        out = subprocess.run(
            ["git", "-C", REPO, "log", "--format=%H", "-1", "--", prev_path],
            capture_output=True,
            text=True,
            check=True,
        )
        rev = out.stdout.strip()
        print(f"A/B baseline rev (recorded {os.path.basename(prev_path)}): {rev[:12]}")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "regression_ab.py"),
            "--rev",
            rev,
            "--queries",
            ",".join(n for n, *_ in up),
            "--repeats",
            str(args.repeats),
        ],
        capture_output=True,
        text=True,
    )
    print(proc.stdout.strip())
    if proc.returncode != 0:
        print(proc.stderr[-2000:])
        return 1
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    real = {
        n: q["ratio"]
        for n, q in report["queries"].items()
        if q["ratio"] and q["ratio"] > 1.2
    }
    if real:
        print(f"REAL regressions (A/B ratio > 1.2): {real}")
        return 1
    print("all movers read as host noise (A/B ratio <= 1.2)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
