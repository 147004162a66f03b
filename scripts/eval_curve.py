#!/usr/bin/env python
"""Render a campaign's eval.jsonl into the metric-vs-step table BASELINE.md
records (VERDICT r2 #1 done-criterion): MMD-CD/COV/1NN/JSD at snapshots,
EMA vs raw.

    python scripts/eval_curve.py runs/campaign_r3/eval.jsonl [--every 10]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--every", type=int, default=1,
                    help="print every k-th record (last always printed)")
    ap.add_argument("--steps_per_epoch", type=int, default=100)
    args = ap.parse_args()

    recs = {}
    with open(args.path) as f:
        for lineno, line in enumerate(f, 1):
            try:
                r = json.loads(line)
            except ValueError:
                # expected only for a truncated trailing line from a
                # watchdog kill; warn so mid-file corruption is visible
                import sys
                print(f"[eval_curve] skipping malformed line {lineno} of "
                      f"{args.path}", file=sys.stderr)
                continue
            recs[r["epoch"]] = r     # restarts overwrite duplicate epochs
    epochs = sorted(recs)
    picked = epochs[:: args.every]
    if epochs and epochs[-1] not in picked:
        picked.append(epochs[-1])

    has_fpd = any(("ema" in recs[e] and "FPD" in recs[e]["ema"])
                  or "FPD" in recs[e].get("raw", {}) for e in epochs)
    fpd_head = " FPD (ema/raw) |" if has_fpd else ""
    print("| step | MMD-CD (ema/raw) | COV-CD (ema/raw) | "
          "1NN-CD (ema/raw) | JSD (ema/raw) |" + fpd_head)
    print("|---|---|---|---|---|" + ("---|" if has_fpd else ""))
    for e in picked:
        r = recs[e]
        ema, raw = r.get("ema"), r.get("raw")
        if ema is None:
            ema = raw
        step = e * args.steps_per_epoch

        def pair(key, fmt):
            if key not in ema:
                return "- / -"
            return f"{ema[key]:{fmt}} / {raw[key]:{fmt}}"

        fpd_col = f" {pair('FPD', '.1f')} |" if has_fpd else ""
        print(f"| {step} | {pair('MMD-CD', '.5f')} | {pair('COV-CD', '.3f')}"
              f" | {pair('1NN-CD', '.3f')} | {pair('JSD', '.4f')} |"
              + fpd_col)

    # summary: best snapshot per metric (ema), for checkpoint selection
    def best(key, lo_good=True, dist_to=None):
        def score(e):
            v = (recs[e].get("ema") or recs[e]["raw"])[key]
            return abs(v - dist_to) if dist_to is not None else \
                (v if lo_good else -v)
        e = min(epochs, key=score)
        return e, (recs[e].get("ema") or recs[e]["raw"])[key]

    print()
    for key, kw in (("MMD-CD", {}), ("COV-CD", {"lo_good": False}),
                    ("1NN-CD", {"dist_to": 0.5}), ("JSD", {})):
        e, v = best(key, **kw)
        print(f"best {key}: {v:.5f} at epoch {e} "
              f"(step {e * args.steps_per_epoch})")


if __name__ == "__main__":
    main()
