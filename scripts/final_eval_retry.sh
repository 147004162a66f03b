#!/bin/bash
# Retry wrapper for the stage-4 held-out eval: the axon TPU backend has
# transient outages (FailedPrecondition mid-program, observed r3 + r4);
# re-run each checkpoint's evaluate.py until its output json is non-empty,
# with backoff, bounded by MAX_TRIES per checkpoint.
set -u
cd "$(dirname "$0")/.."
MAX_TRIES=${MAX_TRIES:-8}

[ -f runs/heldout_ref.npy ] || { echo "[retry] missing heldout_ref.npy — run final_eval_r3b.sh first" >&2; exit 1; }

CKPTS="runs/campaign_r3b/ckpt_epoch_3300.pkl runs/tail_lrboth/ckpt_epoch_3300.pkl runs/tail_lrd/ckpt_epoch_3300.pkl"
mkdir -p runs/final_eval_r3

for ck in $CKPTS; do
    [ -f "$ck" ] || { echo "[retry] missing $ck, skipping" >&2; continue; }
    tag=$(basename "$(dirname "$ck")")_$(basename "$ck" .pkl)
    out="runs/final_eval_r3/$tag.json"
    tries=0
    while [ ! -s "$out" ] && [ "$tries" -lt "$MAX_TRIES" ]; do
        tries=$((tries + 1))
        echo "[retry] $tag attempt $tries" >&2
        timeout 5400 python evaluate.py --log_dir runs/campaign_r3b \
            --ckpt "$ck" --ema --n 96 --ref runs/heldout_ref.npy \
            --normalize --emd > "$out.tmp" 2>/tmp/eval_$tag.err \
            && [ -s "$out.tmp" ] && mv "$out.tmp" "$out" && break
        rm -f "$out.tmp"
        echo "[retry] $tag attempt $tries failed (see /tmp/eval_$tag.err)" >&2
        sleep 120
    done
    if [ -s "$out" ]; then echo "[retry] $tag OK" >&2
    else echo "[retry] $tag EXHAUSTED after $MAX_TRIES tries" >&2; fi
done
echo "[retry] done" >&2
