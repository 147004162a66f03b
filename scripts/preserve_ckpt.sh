#!/bin/bash
# Checkpoint preservation loop. runs/**/*.pkl is gitignored (checkpoints are
# large), which made the r3 832k-step campaign unrecoverable when the
# workspace rotated: the eval curve was committed but every weight pickle was
# lost (see ROADMAP.md round-3 endgame note). This loop bounds that loss to
# one snapshot interval: every CYCLE seconds it copies the newest checkpoint
# of each active run into runs/keep/<run>_latest.pkl (tracked, force-added)
# and commits if the epoch advanced. Git history survives rotations; 21 MB
# per commit is the price of not losing hours of TPU time again.
#
#   nohup bash scripts/preserve_ckpt.sh > /tmp/preserve.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
CYCLE=${CYCLE:-1200}
mkdir -p runs/keep

newest() { ls -t "$1"/ckpt_epoch_*.pkl 2>/dev/null | head -1; }

while :; do
    changed=0
    for dir in ${DIRS:-runs/campaign_r3b runs/tail_lrboth runs/tail_lrd runs/campaign_mc runs/campaign_n8192}; do
        src=$(newest "$dir") || true
        [ -n "${src:-}" ] || continue
        name=$(basename "$dir")
        dst="runs/keep/${name}_latest.pkl"
        marker="runs/keep/${name}_latest.src"
        if [ ! -f "$marker" ] || [ "$(cat "$marker")" != "$src" ]; then
            # copy then rename: never commit a half-written pickle; the
            # trainer itself writes atomically so $src is always complete.
            # Only advance the marker on copy success — otherwise a failed
            # copy (disk full, transient I/O) would record the new path
            # against the stale pickle and never be retried.
            if cp "$src" "$dst.tmp" && mv "$dst.tmp" "$dst"; then
                echo "$src" > "$marker"
                changed=1
            else
                echo "[preserve] copy failed for $src, will retry" >&2
            fi
        fi
        # rolling best checkpoint (Trainer.track_best): preserve whenever
        # best.json advances — losing the peak is exactly the failure the
        # zoo's best-vs-final rows exist to prevent
        best="$dir/ckpt_best.pkl"
        bmark="runs/keep/${name}_best.src"
        if [ -f "$best" ] && [ -f "$dir/best.json" ]; then
            sig=$(cat "$dir/best.json")
            if [ ! -f "$bmark" ] || [ "$(cat "$bmark")" != "$sig" ]; then
                if cp "$best" "runs/keep/${name}_best.pkl.tmp" &&
                   mv "runs/keep/${name}_best.pkl.tmp" "runs/keep/${name}_best.pkl"; then
                    cp "$dir/best.json" "runs/keep/${name}_best.json"
                    echo "$sig" > "$bmark"
                    changed=1
                fi
            fi
        fi
    done
    # re-arm the commit retry if a previous cycle's snapshot is still
    # uncommitted (e.g. both git attempts lost to index-lock contention)
    if [ "$changed" = 0 ] && [ -n "$(git status --porcelain runs/keep/ 2>/dev/null)" ]; then
        changed=1
    fi
    if [ "$changed" = 1 ]; then
        # retry once on index-lock contention with interactive commits
        for _ in 1 2; do
            if git add -f runs/keep/ &&
               git commit -m "preserve: latest campaign checkpoints ($(cat runs/keep/*.src 2>/dev/null | xargs -n1 basename 2>/dev/null | tr '\n' ' '))" \
                   -- runs/keep/ >/dev/null 2>&1; then
                echo "[preserve] committed $(date -u +%H:%M:%S)"
                break
            fi
            sleep 15
        done
    fi
    sleep "$CYCLE"
done
