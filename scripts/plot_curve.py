#!/usr/bin/env python
"""Render a campaign eval.jsonl curve as a small-multiples PNG.

One panel per metric (single y-axis each — never dual-axis), EMA and raw
as the two series, best-EMA-MMD-CD step marked. Companion to
scripts/eval_curve.py (the table digest); this is the judge/reader-facing
figure for MODEL_ZOO/BASELINE writeups.

Usage:
    python scripts/plot_curve.py runs/campaign_horizon/eval.jsonl out.png \
        [--title "..."]
"""
import argparse
import json

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

# light-mode chart tokens (validated default palette)
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE_C = "#c3c2b7"
SERIES = {"ema": "#2a78d6", "raw": "#eb6834"}  # categorical slots 1, 2

METRICS = ["MMD-CD", "COV-CD", "1NN-CD", "JSD", "FPD"]


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_jsonl")
    ap.add_argument("out_png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    rows = load(args.eval_jsonl)
    steps = [r["step"] for r in rows]
    metrics = [m for m in METRICS if any(m in r.get("ema", {}) for r in rows)]
    jsd_scale = rows[-1].get("jsd_scale") if rows else None

    fig, axes = plt.subplots(
        len(metrics), 1, figsize=(8.4, 1.9 * len(metrics)),
        sharex=True, facecolor=SURFACE,
    )
    if len(metrics) == 1:
        axes = [axes]

    # best-EMA-MMD-CD step (the model-selection criterion)
    best_step = None
    if "MMD-CD" in metrics:
        vals = [(r["ema"].get("MMD-CD"), r["step"]) for r in rows
                if r.get("ema", {}).get("MMD-CD") is not None]
        if vals:
            best_step = min(vals)[1]

    for ax, m in zip(axes, metrics):
        ax.set_facecolor(SURFACE)
        for variant in ("ema", "raw"):
            ys = [r.get(variant, {}).get(m) for r in rows]
            pts = [(s, y) for s, y in zip(steps, ys) if y is not None]
            if not pts:
                continue
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=SERIES[variant], linewidth=1.6,
                    label=variant, zorder=3)
        if best_step is not None:
            ax.axvline(best_step, color=BASELINE_C, linewidth=1.0,
                       linestyle=(0, (4, 3)), zorder=2)
        label = m
        if m == "JSD" and jsd_scale is not None:
            label = f"JSD@{jsd_scale:g}"
        ax.set_ylabel(label, color=INK_2, fontsize=9)
        ax.grid(axis="y", color=GRID, linewidth=0.7, zorder=1)
        ax.tick_params(colors=MUTED, labelsize=8)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(BASELINE_C)

    axes[0].legend(loc="upper right", fontsize=8, frameon=False,
                   labelcolor=INK_2)
    if best_step is not None:
        axes[0].annotate(f"best EMA MMD-CD @ {best_step:,}",
                         xy=(best_step, 1.0), xycoords=("data", "axes fraction"),
                         xytext=(6, -2), textcoords="offset points",
                         color=INK_2, fontsize=8, va="top")
    axes[-1].set_xlabel("training step", color=INK_2, fontsize=9)
    if args.title:
        fig.suptitle(args.title, color=INK, fontsize=11, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97 if args.title else 1.0))
    fig.savefig(args.out_png, dpi=160, facecolor=SURFACE)
    print(f"wrote {args.out_png} ({len(rows)} eval points, "
          f"{len(metrics)} panels)")


if __name__ == "__main__":
    main()
