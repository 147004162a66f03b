#!/usr/bin/env python
"""Reference-length training campaign (VERDICT r2 next-round #1): run the
shipped default config for hundreds of thousands of steps on the synthetic
shape family (ShapeNet H5 is not present in this environment) with the
in-loop metric eval recording MMD-CD/COV/1NN/JSD at snapshot cadence into
log_dir/eval.jsonl.

The reference trains 6000 epochs (~1.7M steps at its dataloader sizes,
`/root/reference/Generation/config.py:68`); at ~39 steps/s this script covers
>=500k steps in ~4h and ~1M in ~7h. Restartable: --restore resumes from the
newest checkpoint in --log_dir.

    python scripts/campaign.py --max_epoch 8000 [--restore]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sp_gan_tpu.config import parse_args

    cfg = parse_args()
    # campaign defaults on top of the shipped config (CLI can override by
    # passing flags AFTER these are applied — parse_args already ran, so
    # only fill fields the user left at their defaults)
    if cfg.log_dir == "log":
        cfg = cfg.replace(log_dir="runs/campaign_r3")
    if cfg.eval_every == 0:
        cfg = cfg.replace(eval_every=20)      # every 2000 steps
    if not cfg.ema:
        cfg = cfg.replace(ema=True)           # EMA-vs-raw curves
    if cfg.steps_per_epoch is None:
        cfg = cfg.replace(steps_per_epoch=100)
    if cfg.watchdog_secs == 0:
        # exit 42 on a wedged device dispatch (observed in this
        # environment) so campaign_supervised.sh restarts from the last
        # snapshot; well above cold-compile (~3 min) and eval cost
        cfg = cfg.replace(watchdog_secs=600)

    from sp_gan_tpu.data import SyntheticDataset, SyntheticMultiClassDataset
    from sp_gan_tpu.train import Trainer

    # --con: the multi-class campaign analog of the reference's
    # chair/table/bench concatenation (H5DataLoader.py:47-60) — trains
    # unconditionally on the class mix, exactly like the reference.
    if cfg.con:
        dataset = SyntheticMultiClassDataset(
            n_items=2400, n_points=cfg.np, n_classes=cfg.cls)
    else:
        dataset = SyntheticDataset(n_items=2400, n_points=cfg.np)
    tr = Trainer(cfg, dataset=dataset)
    tr.log(f"[campaign] starting at epoch {tr.start_epoch}, "
           f"{cfg.steps_per_epoch} steps/epoch, target {cfg.max_epoch} epochs"
           f" ({cfg.max_epoch * cfg.steps_per_epoch} steps)")
    tr.train()


if __name__ == "__main__":
    main()
