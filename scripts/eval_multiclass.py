#!/usr/bin/env python
"""Per-class + pooled held-out evaluation for a --con multi-class campaign
(VERDICT r3 next-round #6; reference analog: the chair/table/bench
concatenated training set, H5DataLoader.py:47-60 — the reference itself
never evaluates per class).

The generator is unconditional (like the reference's --con training), so
per-class scores slice the pooled gen-x-ref CD matrix by REFERENCE class:
  MMD-CD[c]  mean over class-c refs of their closest generated cloud —
             how well the model covers class c
  COV[c]     fraction of class-c refs that are the nearest ref of some
             generated cloud under the pooled assignment — whether class c
             receives its share of the generated mass

    python scripts/eval_multiclass.py --log_dir runs/campaign_mc \
        --ckpt runs/campaign_mc/ckpt_epoch_1500.pkl --n 96
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ema", action="store_true", default=True)
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--n_ref_per_class", type=int, default=32)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticMultiClassDataset
    from sp_gan_tpu.data.augment import normalize_point_cloud
    from sp_gan_tpu.eval.metrics import (
        compute_all_metrics, pairwise_cd_matrix, per_class_metrics)
    from sp_gan_tpu.manipulate import from_checkpoint
    from sp_gan_tpu.train.checkpoint import latest_checkpoint

    with open(os.path.join(args.log_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    ckpt = args.ckpt or latest_checkpoint(args.log_dir)
    man = from_checkpoint(ckpt, cfg, use_ema=args.ema)
    gen = np.asarray(normalize_point_cloud(man.generate(args.n)))

    # held-out draw: disjoint seed from the training set (campaign seed=0);
    # class-balanced by construction (labels cycle)
    n_cls = cfg.cls
    ds = SyntheticMultiClassDataset(
        n_items=args.n_ref_per_class * n_cls, n_points=cfg.np,
        seed=args.seed, n_classes=n_cls)
    ref = np.asarray(normalize_point_cloud(ds.data))
    labels = ds.labels

    out = {"ckpt": ckpt, "n_gen": len(gen), "n_ref": len(ref),
           "pooled": compute_all_metrics(gen, ref)}

    gt = np.asarray(pairwise_cd_matrix(jnp.asarray(gen), jnp.asarray(ref)))
    out.update(per_class_metrics(gt, labels, n_cls))
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
