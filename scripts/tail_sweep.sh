#!/bin/bash
# Late-horizon LR intervention sweep (round 3). The 900k-step campaign shows
# a slow quality drift after ~150k steps with the D overpowering
# (real_acc -> 1.0); the reference's answer to long-horizon schedules is
# StepLR decay of both LRs (/root/reference/Generation/config.py:75-78,
# model.py:100-110). This sweep restarts THREE tails from the campaign's
# final checkpoint and lets eval.jsonl decide which intervention recovers
# quality:
#   tail_ctrl   — lr unchanged (1e-4 / 1e-4): the drift control
#   tail_lrboth — both LRs x0.1 (what --lr_decay would reach)
#   tail_lrd    — D LR x0.1 only (rebalances the overpowering D)
# Sequential: one TPU chip. ~20 min per tail (500 epochs at ~42 steps/s).
set -e
cd "$(dirname "$0")/.."
CKPT=runs/campaign_r3/ckpt_epoch_9000.pkl
EPOCHS=9500

python scripts/campaign.py --log_dir runs/tail_ctrl --restore \
    --pretrain_model_G "$CKPT" --max_epoch $EPOCHS
python scripts/campaign.py --log_dir runs/tail_lrboth --restore \
    --pretrain_model_G "$CKPT" --max_epoch $EPOCHS --lr_g 1e-5 --lr_d 1e-5
python scripts/campaign.py --log_dir runs/tail_lrd --restore \
    --pretrain_model_G "$CKPT" --max_epoch $EPOCHS --lr_d 1e-5
