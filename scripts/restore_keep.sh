#!/bin/bash
# Post-rotation restore: put preserved checkpoints back where the campaign
# expects them. scripts/preserve_ckpt.sh commits runs/keep/<run>_latest.pkl
# plus a .src marker recording the original path; this copies each one back
# unless the run dir already has a checkpoint at the preserved epoch or
# newer (compared by epoch number — a partial rotation can leave OLDER
# checkpoints behind, which must not shadow the preserved newer weights).
# Run this BEFORE relaunching scripts/finish_r3b.sh after a rotation.
set -u
cd "$(dirname "$0")/.."

# epoch number from a ckpt_epoch_<N>.pkl path (0 if unparseable)
epoch_of() {
    basename "$1" | sed -n 's/^ckpt_epoch_\([0-9]*\)\.pkl$/\1/p' | grep . || echo 0
}

for marker in runs/keep/*_latest.src; do
    [ -f "$marker" ] || continue
    src_path=$(cat "$marker")
    keep_pkl="${marker%.src}.pkl"
    [ -f "$keep_pkl" ] || continue
    dir=$(dirname "$src_path")
    kept_epoch=$(epoch_of "$src_path")
    max_epoch=0
    for f in "$dir"/ckpt_epoch_*.pkl; do
        [ -f "$f" ] || continue
        e=$(epoch_of "$f")
        [ "$e" -gt "$max_epoch" ] && max_epoch=$e
    done
    if [ "$max_epoch" -ge "$kept_epoch" ]; then
        echo "[restore_keep] $dir has epoch $max_epoch >= preserved" \
             "$kept_epoch, skipping" >&2
        continue
    fi
    mkdir -p "$dir"
    cp "$keep_pkl" "$src_path"
    echo "[restore_keep] restored $src_path (epoch $kept_epoch over" \
         "run-dir max $max_epoch)" >&2
done
