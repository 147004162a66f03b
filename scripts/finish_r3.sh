#!/bin/bash
# Hands-free round-3 finisher. Owns the whole remaining TPU chain so it
# survives device outages without supervision:
#   1. campaign_r3 -> epoch 9000 (supervised restarts on watchdog exit 42)
#   2. control tail: extend campaign_r3 -> 9300 at unchanged LR (the
#      restore replays an identical epoch stream, so campaign_r3's
#      eval.jsonl over steps 900k-930k IS the control curve)
#   3. intervention tails from ckpt_epoch_9000: both-LR x0.1 and D-LR x0.1
#      (the reference's long-horizon answer is StepLR decay,
#      /root/reference/Generation/config.py:75-78, model.py:100-110)
#   4. end-of-round measurement sweep + bench.py
# Each stage retries on rc=42 (wedged device dispatch, see
# sp_gan_tpu/utils/watchdog.py); any other nonzero exit aborts the chain.
set -u
cd "$(dirname "$0")/.."

CKPT=runs/campaign_r3/ckpt_epoch_9000.pkl

# Supervised campaign run: $1=log_dir, $2=max_epoch, rest=extra flags.
# First attempt of a fresh tail warm-starts from $CKPT; retries resume from
# the tail's OWN newest checkpoint (plain --restore) so watchdog restarts
# don't rewind to epoch 9000 — unless the tail wedged before its first
# snapshot, in which case warm-start again.
run_stage() {
    local dir=$1 epochs=$2; shift 2
    while :; do
        if [ "$dir" != runs/campaign_r3 ] && \
           ! ls "$dir"/ckpt_epoch_*.pkl >/dev/null 2>&1; then
            python scripts/campaign.py --log_dir "$dir" --restore \
                --pretrain_model_G "$CKPT" --max_epoch "$epochs" "$@"
        else
            python scripts/campaign.py --log_dir "$dir" --restore \
                --max_epoch "$epochs" "$@"
        fi
        rc=$?
        if [ "$rc" -ne 42 ]; then return "$rc"; fi
        echo "[finish_r3] watchdog restart (rc=42) in $dir" >&2
        sleep 30
    done
}

echo "[finish_r3] stage 1: campaign -> 9000" >&2
run_stage runs/campaign_r3 9000 || exit $?

echo "[finish_r3] stage 2: control extension -> 9300" >&2
run_stage runs/campaign_r3 9300 || exit $?

echo "[finish_r3] stage 3a: tail_lrboth" >&2
run_stage runs/tail_lrboth 9300 --lr_g 1e-5 --lr_d 1e-5 || exit $?

echo "[finish_r3] stage 3b: tail_lrd" >&2
run_stage runs/tail_lrd 9300 --lr_d 1e-5 || exit $?

echo "[finish_r3] stage 4: held-out eval + measurements" >&2
bash scripts/final_eval_r3.sh
echo "[finish_r3] done" >&2
