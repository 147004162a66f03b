#!/usr/bin/env python
"""CLI: batch generation from a checkpoint to .npy / .xyz
(the `simple_gen` path of `/root/reference/visual.py` + `model_test.py:139-203`).

    python generate.py --log_dir log/run --choice Chair --n 100 --out samples.npy
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--ckpt", default=None, help="explicit checkpoint path")
    p.add_argument("--ema", action="store_true",
                   help="use the EMA generator weights from the checkpoint")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples.npy")
    p.add_argument("--wire", default=None, choices=["float32", "bfloat16"],
                   help="device->host wire format for bulk generation; "
                   "bfloat16 halves the fetch bytes (output stays float32, "
                   "coords rounded through bf16 — quality-free per the r4 "
                   "serving-precision probe)")
    p.add_argument("--xyz_dir", default=None, help="also dump per-shape .xyz")
    args = p.parse_args()

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.manipulate import from_checkpoint
    from sp_gan_tpu.train.checkpoint import latest_checkpoint
    from sp_gan_tpu.utils import enable_compile_cache
    from sp_gan_tpu.viz import save_xyz

    enable_compile_cache()
    with open(os.path.join(args.log_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    ckpt = args.ckpt or latest_checkpoint(args.log_dir)
    assert ckpt, f"no checkpoint in {args.log_dir}"
    man = from_checkpoint(ckpt, cfg, use_ema=args.ema)
    pcs = man.generate(args.n, seed=args.seed, wire_dtype=args.wire)
    np.save(args.out, pcs)
    print(f"saved {pcs.shape} -> {args.out}")
    if args.xyz_dir:
        os.makedirs(args.xyz_dir, exist_ok=True)
        for i, pc in enumerate(pcs):
            save_xyz(os.path.join(args.xyz_dir, f"{i}.xyz"), pc)


if __name__ == "__main__":
    main()
