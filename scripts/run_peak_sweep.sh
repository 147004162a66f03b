#!/bin/bash
# Round-5 peak-quality sweep (final round "beat the flagship" push).
#
# The horizon campaign proved quality peaks EARLY (~25k steps; flagship
# ckpt_best held-out MMD-CD 0.00795, runs/final_eval_horizon/). That makes
# peak-quality experiments cheap: 400 epochs = 40k steps ~ 18 min/variant
# on one chip. This sweep runs the knobs never tried at campaign scale at
# the default N=2048 regime, each with in-loop eval every 1k steps +
# best-checkpoint tracking + in-loop FPD, against the SAME held-out
# reference as the horizon run (runs/heldout_ref.npy) so every number is
# directly comparable to the 0.00795 flagship:
#
#   approx   --knn_mode approx      (banded kNN at N=2048: quality + speed)
#   attn     --attn                 (G self-attention, Generator.py:116-117;
#                                    unit-tested, never trained at scale)
#   ema9995  --ema_rate 0.9995      (slower EMA — peak is early + drifts,
#                                    stronger smoothing may bank it better)
#   lr5e5    --lr_g 5e-5 --lr_d 5e-5 (half LR: later but deeper peak?)
#   nmix     --n_mix                (sphere-local z mixing, model.py:133-141;
#                                    quality-neutral at 5k-step probe)
#   seed7    --seed 7               (seed spread of the 25k peak vs the
#                                    horizon control at seed 123)
#
# Stage 2 per variant: CD-only held-out eval of ckpt_best + final.
# Stage 3 (manual, after reading the table): full CD+EMD on the winner.
# Restartable end-to-end: each campaign resumes from its newest snapshot;
# completed stages skip on rerun; the outer loop probes the relay before
# any (re)launch (ROADMAP 2026-08-20 outage incident).
#
#   nohup bash scripts/run_peak_sweep.sh > /tmp/peak_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

FINAL=${FINAL:-400}
BASE=runs/sweep_peak
mkdir -p "$BASE"

VARIANTS="approx attn ema9995 lr5e5 nmix seed7"
flags_for() {
    case "$1" in
        approx)  echo "--knn_mode approx" ;;
        attn)    echo "--attn" ;;
        ema9995) echo "--ema_rate 0.9995" ;;
        lr5e5)   echo "--lr_g 5e-5 --lr_d 5e-5" ;;
        nmix)    echo "--n_mix" ;;
        seed7)   echo "--seed 7" ;;
    esac
}

relay_live() {
    timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

newest_epoch() {
    ls "$1"/ckpt_epoch_*.pkl 2>/dev/null \
        | sed 's/.*ckpt_epoch_\([0-9]*\)\.pkl/\1/' | sort -n | tail -1
}

for v in $VARIANTS; do
    DIR="$BASE/$v"
    if [ ! -f "$DIR/ckpt_epoch_${FINAL}.pkl" ]; then
        last_ep=$(newest_epoch "$DIR"); last_ep=${last_ep:-0}
        stuck=0
        while :; do
            if ! relay_live; then
                echo "[sweep:$v] relay down at $(date); waiting" >&2
                sleep 120
                continue
            fi
            # shellcheck disable=SC2046
            python scripts/campaign.py --log_dir "$DIR" --restore \
                --max_epoch "$FINAL" --eval_every 10 \
                --fpd_weights runs/fpd_dgcnn_synth.pkl $(flags_for "$v") &
            echo $! > /tmp/peak_sweep.pid
            wait "$(cat /tmp/peak_sweep.pid)"
            rc=$?
            [ "$rc" -eq 0 ] && break
            cur_ep=$(newest_epoch "$DIR"); cur_ep=${cur_ep:-0}
            if [ "$cur_ep" -gt "$last_ep" ]; then stuck=0; else stuck=$((stuck+1)); fi
            last_ep=$cur_ep
            if [ "$stuck" -ge 3 ]; then
                echo "[sweep:$v] no progress across 3 restarts (rc=$rc) — skipping variant" >&2
                break
            fi
            echo "[sweep:$v] restart (rc=$rc, epoch=$cur_ep)" >&2
            sleep 30
        done
    fi
    # stage 2: CD-only held-out eval (best + final), same ref as horizon
    for ck in "$DIR/ckpt_best.pkl" "$DIR/ckpt_epoch_${FINAL}.pkl"; do
        [ -f "$ck" ] || continue
        tag="${v}_$(basename "$ck" .pkl)"
        if [ ! -s "$BASE/eval_$tag.json" ]; then
            echo "[sweep:$v] eval $ck -> eval_$tag.json" >&2
            timeout 1800 python evaluate.py --log_dir "$DIR" \
                --ckpt "$ck" --ema --n 96 --ref runs/heldout_ref.npy \
                --normalize > "$BASE/eval_$tag.json" \
                || { echo "[sweep:$v] eval FAILED $ck" >&2; rm -f "$BASE/eval_$tag.json"; }
        fi
    done
done
echo "[sweep] all variants done at $(date)" >&2
