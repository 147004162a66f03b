#!/bin/bash
# Training-scale quality A/B for --knn_mode approx at N=8192 (round 5).
#
# The 600-step probe (runs/probe_approx_knn.jsonl) showed the fused banded
# selection is 1.76x faster than exact with no early-training quality gap.
# This runs the approx mode through the SAME campaign the exact kernel ran
# in round 4 (runs/campaign_n8192: 500 epochs x 100 steps, bs=4, eval
# every 50) and evaluates the final + best checkpoints under the identical
# held-out protocol (EMA, n=48, runs/heldout_ref_8192.npy, CD-only — the
# documented N=8192 regime, docs/WORKFLOWS.md), so the two rows in
# MODEL_ZOO/BASELINE are exactly comparable.
#
# Waits for the horizon supervisor (scripts/run_horizon.sh) to release the
# chip before starting; restartable (watchdog rc=42 -> resume, stages skip
# if outputs exist).
#
#   nohup bash scripts/run_n8192_approx.sh > /tmp/n8192_approx.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DIR=runs/campaign_n8192_approx
FINAL=${FINAL:-500}
WAIT_PID=${WAIT_PID:-}

# --- stage 0: wait for the chip ------------------------------------------
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

newest_epoch() {
    ls "$DIR"/ckpt_epoch_*.pkl 2>/dev/null \
        | sed 's/.*ckpt_epoch_\([0-9]*\)\.pkl/\1/' | sort -n | tail -1
}

# --- stage 1: campaign ----------------------------------------------------
if [ ! -f "$DIR/ckpt_epoch_${FINAL}.pkl" ]; then
    last_ep=$(newest_epoch); last_ep=${last_ep:-0}
    stuck=0
    while :; do
        python scripts/campaign.py --log_dir "$DIR" --restore \
            --np 8192 --bs 4 --knn_mode approx \
            --max_epoch "$FINAL" --eval_every 50 &
        echo $! > /tmp/campaign_n8192_approx.pid
        wait "$(cat /tmp/campaign_n8192_approx.pid)"
        rc=$?
        [ "$rc" -eq 0 ] && break
        cur_ep=$(newest_epoch); cur_ep=${cur_ep:-0}
        if [ "$cur_ep" -gt "$last_ep" ]; then stuck=0; else stuck=$((stuck+1)); fi
        last_ep=$cur_ep
        if [ "$stuck" -ge 2 ]; then
            echo "[n8192_approx] no progress across 2 restarts (rc=$rc, epoch=$cur_ep) — giving up" >&2
            break
        fi
        echo "[n8192_approx] restart (rc=$rc, epoch=$cur_ep)" >&2
        sleep 30
    done
    [ -f "$DIR/ckpt_epoch_${FINAL}.pkl" ] \
        || { echo "[n8192_approx] FATAL: campaign did not reach ${FINAL}" >&2; exit 1; }
fi

# --- stage 2: held-out eval (same protocol as runs/final_eval_n8192.json) -
for ck in "$DIR/ckpt_best.pkl" "$DIR/ckpt_epoch_${FINAL}.pkl"; do
    [ -f "$ck" ] || continue
    tag=n8192_approx_$(basename "$ck" .pkl)
    if [ ! -s "runs/final_eval_${tag}.json" ]; then
        echo "[n8192_approx] eval $ck -> $tag" >&2
        timeout 5400 python evaluate.py --log_dir "$DIR" \
            --ckpt "$ck" --ema --n 48 --ref runs/heldout_ref_8192.npy \
            --normalize > "runs/final_eval_${tag}.json" \
            || echo "[n8192_approx] FAILED $ck" >&2
    fi
done
echo "[n8192_approx] done" >&2
