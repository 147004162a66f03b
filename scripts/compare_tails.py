#!/usr/bin/env python
"""Align several runs' eval.jsonl curves over the same step range — the
analysis tool for the LR-intervention tail sweep (scripts/tail_sweep.sh).

    python scripts/compare_tails.py runs/campaign_r3 runs/tail_lrboth \
        runs/tail_lrd --metric MMD-CD --min_step 900000
"""

import argparse
import json
import os
import sys


def load(run_dir):
    recs = {}
    path = os.path.join(run_dir, "eval.jsonl")
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            try:
                r = json.loads(line)
            except ValueError:
                # expected only for a truncated trailing line from a
                # watchdog kill; warn so mid-file corruption is visible
                print(f"[compare_tails] skipping malformed line {lineno} "
                      f"of {path}", file=sys.stderr)
                continue
            recs[r["step"]] = r     # restarts overwrite duplicate steps
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--metric", default="MMD-CD")
    ap.add_argument("--which", default="ema", choices=["ema", "raw"])
    ap.add_argument("--min_step", type=int, default=0)
    ap.add_argument("--max_step", type=int, default=1 << 60)
    args = ap.parse_args()

    curves = {os.path.basename(r.rstrip("/")): load(r) for r in args.runs}
    steps = sorted({s for c in curves.values() for s in c
                    if args.min_step <= s <= args.max_step})
    names = list(curves)

    print("| step | " + " | ".join(names) + " |")
    print("|---" * (len(names) + 1) + "|")
    sums = {n: [0.0, 0] for n in names}
    for s in steps:
        cells = []
        for n in names:
            r = curves[n].get(s)
            v = (r.get(args.which) or r["raw"])[args.metric] if r else None
            cells.append(f"{v:.5f}" if v is not None else "-")
            if v is not None:
                sums[n][0] += v
                sums[n][1] += 1
        print(f"| {s} | " + " | ".join(cells) + " |")
    means = " | ".join(
        f"{sums[n][0] / sums[n][1]:.5f}" if sums[n][1] else "-"
        for n in names)
    print(f"| mean | {means} |")


if __name__ == "__main__":
    main()
