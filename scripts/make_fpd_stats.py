#!/usr/bin/env python
"""Precompute FPD reference statistics (the `pre_statistics_*.npz` the
reference expects at `--FPD_path`, Generation/config.py:134) from a dataset.

    python scripts/make_fpd_stats.py --data data/2048/chair.h5 \
        --out pre_statistics_chair.npz [--n 5000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help=".h5 (poisson_* key) or .npy")
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--np", type=int, default=2048)
    args = p.parse_args()

    from sp_gan_tpu.eval import FPD
    from sp_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if args.data.endswith(".h5"):
        from sp_gan_tpu.data import load_h5
        clouds = load_h5(args.data, args.np)
    else:
        clouds = np.load(args.data)
    clouds = clouds[: args.n]

    fpd = FPD()
    fpd.save_statistics(clouds, args.out)
    note = " (random-feature extractor)" if fpd.random_features else ""
    print(f"saved FPD stats for {len(clouds)} clouds -> {args.out}{note}")


if __name__ == "__main__":
    main()
