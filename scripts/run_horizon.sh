#!/bin/bash
# Reference-scale horizon campaign (VERDICT r4 next-round #3): the shipped
# defaults to 10,000 epochs x 100 steps = 1M steps (the reference's default
# horizon is 6000 epochs ~ 1.7M steps at its dataloader sizes,
# /root/reference/Generation/config.py:68; the longest completed run here
# before this was 330k steps). Adds the three r5 trainer upgrades:
#   - --lr_decay both-LR StepLR (proven safe-but-neutral at 330k, r4).
#     The period is scaled to the horizon: feq=1000 epochs x gamma=0.7
#     -> 10 decays, terminal LR ~2.8% of initial. The reference default
#     feq=40 would hit gamma^250 ~ 1e-38 by epoch 1500 and silently
#     freeze the run — at ANY multi-thousand-epoch horizon that flag
#     combination is a trap, which is presumably why the reference ships
#     --lr_decay off.
#   - best-checkpoint tracking (ckpt_best.pkl at best in-loop EMA MMD-CD)
#   - in-loop FPD column (runs/fpd_dgcnn_synth.pkl extractor; stats from
#     the eval reference draw — synthetic-family-only numbers)
#
# Stage 2 runs the held-out final protocol (n=96 vs runs/heldout_ref.npy,
# EMA weights, CD+EMD) on BOTH the best and the final checkpoint.
# Restartable end-to-end: the campaign resumes from the newest snapshot on
# watchdog exit 42, and completed stages skip on rerun.
#
#   nohup bash scripts/run_horizon.sh > /tmp/horizon.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DIR=runs/campaign_horizon
FINAL=${FINAL:-10000}

if [ -f /tmp/campaign_horizon.pid ]; then
    while kill -0 "$(cat /tmp/campaign_horizon.pid)" 2>/dev/null; do sleep 60; done
fi
# newest snapshot epoch (for crash-loop detection)
newest_epoch() {
    ls "$DIR"/ckpt_epoch_*.pkl 2>/dev/null \
        | sed 's/.*ckpt_epoch_\([0-9]*\)\.pkl/\1/' | sort -n | tail -1
}

if [ ! -f "$DIR/ckpt_epoch_${FINAL}.pkl" ]; then
    last_ep=$(newest_epoch); last_ep=${last_ep:-0}
    stuck=0
    while :; do
        python scripts/campaign.py --log_dir "$DIR" --restore \
            --max_epoch "$FINAL" --lr_decay --lr_decay_feq 1000 \
            --eval_every 50 --fpd_weights runs/fpd_dgcnn_synth.pkl &
        echo $! > /tmp/campaign_horizon.pid
        wait "$(cat /tmp/campaign_horizon.pid)"
        rc=$?
        [ "$rc" -eq 0 ] && break
        # restart on ANY failure (watchdog 42, SIGKILL from a dying parent
        # session, transient backend outage) as long as checkpoints advance;
        # two consecutive restarts with zero progress = real crash, stop.
        cur_ep=$(newest_epoch); cur_ep=${cur_ep:-0}
        if [ "$cur_ep" -gt "$last_ep" ]; then stuck=0; else stuck=$((stuck+1)); fi
        last_ep=$cur_ep
        if [ "$stuck" -ge 2 ]; then
            echo "[horizon] no progress across 2 restarts (rc=$rc, epoch=$cur_ep) — giving up" >&2
            break
        fi
        echo "[horizon] restart (rc=$rc, epoch=$cur_ep)" >&2
        sleep 30
    done
    [ -f "$DIR/ckpt_epoch_${FINAL}.pkl" ] \
        || { echo "[horizon] FATAL: campaign did not reach ${FINAL}" >&2; exit 1; }
fi

# --- stage 2: held-out final eval (best + final checkpoints) -------------
mkdir -p runs/final_eval_horizon
for ck in "$DIR/ckpt_best.pkl" "$DIR/ckpt_epoch_${FINAL}.pkl"; do
    [ -f "$ck" ] || continue
    tag=horizon_$(basename "$ck" .pkl)
    if [ ! -s "runs/final_eval_horizon/$tag.json" ]; then
        echo "[horizon] eval $ck -> $tag" >&2
        timeout 3600 python evaluate.py --log_dir "$DIR" \
            --ckpt "$ck" --ema --n 96 --ref runs/heldout_ref.npy \
            --normalize --emd > "runs/final_eval_horizon/$tag.json" \
            || echo "[horizon] FAILED $ck" >&2
    fi
done
echo "[horizon] done" >&2
