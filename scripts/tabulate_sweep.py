#!/usr/bin/env python
"""Tabulate the round-5 peak-quality sweep (scripts/run_peak_sweep.sh).

Collects, per variant under runs/sweep_peak/:
  - held-out CD metrics of ckpt_best and the final checkpoint
    (eval_<variant>_<ckpt>.json written by the sweep's stage 2),
  - the in-loop best marker (best.json: metric/epoch/step),
  - sustained training throughput (median over per-epoch log lines).

Prints one markdown table, flagship row included for comparison.

    python scripts/tabulate_sweep.py [--base runs/sweep_peak]
"""

import argparse
import glob
import json
import os
import re
import sys

FLAGSHIP = ("horizon flagship (defaults, best of 1M)",
            "runs/final_eval_horizon/horizon_ckpt_best.json", 25000)


def throughput_median(log_path):
    rates = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                m = re.search(r"throughput: ([0-9.]+) steps/s", line)
                if m:
                    rates.append(float(m.group(1)))
    if not rates:
        return None
    rates.sort()
    return rates[len(rates) // 2]


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="runs/sweep_peak")
    args = p.parse_args()

    rows = []
    fj = load(FLAGSHIP[1])
    if fj:
        rows.append((FLAGSHIP[0], FLAGSHIP[2], fj, None))

    variants = sorted(d for d in os.listdir(args.base)
                      if os.path.isdir(os.path.join(args.base, d)))
    for v in variants:
        vd = os.path.join(args.base, v)
        best = load(os.path.join(vd, "best.json")) or {}
        med = throughput_median(os.path.join(vd, "log_train.txt"))
        for tag, step in (("ckpt_best", best.get("step")),
                          ("final", None)):
            pats = (f"eval_{v}_ckpt_best.json" if tag == "ckpt_best"
                    else f"eval_{v}_ckpt_epoch_*.json")
            hits = sorted(glob.glob(os.path.join(args.base, pats)))
            if not hits:
                continue
            ev = load(hits[-1])
            if ev:
                rows.append((f"{v} [{tag}]", step, ev, med))

    print("| variant | best@step | MMD-CD | COV-CD | 1NN-CD | JSD@0.5 "
          "| med steps/s |")
    print("|---|---|---|---|---|---|---|")
    for name, step, ev, med in rows:
        print(f"| {name} | {step if step else '-'} "
              f"| {ev.get('MMD-CD', float('nan')):.5f} "
              f"| {ev.get('COV-CD', float('nan')):.3f} "
              f"| {ev.get('1NN-CD', float('nan')):.3f} "
              f"| {ev.get('JSD', float('nan')):.4f} "
              f"| {f'{med:.1f}' if med else '-'} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
