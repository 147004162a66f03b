#!/bin/bash
# Late-horizon LR intervention sweep (round 3). The 900k-step campaign shows
# a slow quality drift after ~150k steps with the D overpowering
# (real_acc -> 1.0); the reference's answer to long-horizon schedules is
# StepLR decay of both LRs (/root/reference/Generation/config.py:75-78,
# model.py:100-110). This sweep restarts tails from the campaign's final
# checkpoint and lets eval.jsonl decide which intervention recovers quality:
#   tail_lrboth — both LRs x0.1 (what --lr_decay converges to)
#   tail_lrd    — D LR x0.1 only (rebalances the overpowering D)
# The control (lr unchanged) is the campaign extension itself: restoring
# runs/campaign_r3 from the same checkpoint with the same config replays an
# identical epoch stream (per-epoch permutations and data keys depend only
# on cfg.seed and call order), so its eval.jsonl over the same steps IS the
# control curve. Sequential: one TPU chip, ~13 min per tail (300 epochs).
set -e
cd "$(dirname "$0")/.."
CKPT=runs/campaign_r3/ckpt_epoch_9000.pkl
EPOCHS=9300

python scripts/campaign.py --log_dir runs/tail_lrboth --restore \
    --pretrain_model_G "$CKPT" --max_epoch $EPOCHS --lr_g 1e-5 --lr_d 1e-5
python scripts/campaign.py --log_dir runs/tail_lrd --restore \
    --pretrain_model_G "$CKPT" --max_epoch $EPOCHS --lr_d 1e-5
