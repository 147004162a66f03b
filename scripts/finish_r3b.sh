#!/bin/bash
# Round-3 relaunch finisher (r3b). The 832k-step campaign_r3 curve is
# committed (BASELINE.md), but its checkpoint pickles were untracked and
# lost in a workspace rotation — so the held-out final eval and the LR
# tail sweep never ran on real weights. This chain reruns a shorter
# campaign (3000 epochs = 300k steps) that covers the measured quality
# peak (best EMA MMD-CD was at 112k steps) plus plateau entry, then runs
# the tails + held-out eval the original runbook planned:
#   1. campaign_r3b -> epoch 3000
#   2. control extension -> 3300 at unchanged LR (campaign_r3b's
#      eval.jsonl over steps 300k-330k IS the control curve)
#   3. intervention tails from ckpt_epoch_3000: both-LR x0.1 and D-LR x0.1
#      (the reference's long-horizon answer is StepLR decay,
#      /root/reference/Generation/config.py:75-78, model.py:100-110)
#   4. scripts/final_eval_r3b.sh: held-out 96x96 protocol + perf sweep
# Each stage retries on rc=42 (wedged device dispatch watchdog).
set -u
cd "$(dirname "$0")/.."

CKPT=runs/campaign_r3b/ckpt_epoch_3000.pkl

run_stage() {
    local dir=$1 epochs=$2; shift 2
    while :; do
        if [ "$dir" != runs/campaign_r3b ] && \
           ! ls "$dir"/ckpt_epoch_*.pkl >/dev/null 2>&1; then
            python scripts/campaign.py --log_dir "$dir" --restore \
                --pretrain_model_G "$CKPT" --max_epoch "$epochs" "$@"
        else
            python scripts/campaign.py --log_dir "$dir" --restore \
                --max_epoch "$epochs" "$@"
        fi
        rc=$?
        if [ "$rc" -ne 42 ]; then return "$rc"; fi
        echo "[finish_r3b] watchdog restart (rc=42) in $dir" >&2
        sleep 30
    done
}

echo "[finish_r3b] stage 1: campaign -> 3000" >&2
run_stage runs/campaign_r3b 3000 || exit $?

echo "[finish_r3b] stage 2: control extension -> 3300" >&2
run_stage runs/campaign_r3b 3300 || exit $?

echo "[finish_r3b] stage 3a: tail_lrboth" >&2
run_stage runs/tail_lrboth 3300 --lr_g 1e-5 --lr_d 1e-5 || exit $?

echo "[finish_r3b] stage 3b: tail_lrd" >&2
run_stage runs/tail_lrd 3300 --lr_d 1e-5 || exit $?

echo "[finish_r3b] stage 4: held-out eval + measurements" >&2
bash scripts/final_eval_r3b.sh
echo "[finish_r3b] done" >&2
