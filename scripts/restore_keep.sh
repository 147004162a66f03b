#!/bin/bash
# Post-rotation restore: put preserved checkpoints back where the campaign
# expects them. scripts/preserve_ckpt.sh commits runs/keep/<run>_latest.pkl
# plus a .src marker recording the original path; this copies each one back
# (only if the run dir doesn't already have a newer checkpoint). Run this
# BEFORE relaunching scripts/finish_r3b.sh after a workspace rotation.
set -u
cd "$(dirname "$0")/.."

for marker in runs/keep/*_latest.src; do
    [ -f "$marker" ] || continue
    src_path=$(cat "$marker")
    keep_pkl="${marker%.src}.pkl"
    [ -f "$keep_pkl" ] || continue
    dir=$(dirname "$src_path")
    if ls "$dir"/ckpt_epoch_*.pkl >/dev/null 2>&1; then
        echo "[restore_keep] $dir already has checkpoints, skipping" >&2
        continue
    fi
    mkdir -p "$dir"
    cp "$keep_pkl" "$src_path"
    echo "[restore_keep] restored $src_path" >&2
done
