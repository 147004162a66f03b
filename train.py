#!/usr/bin/env python
"""CLI: train SP-GAN on TPU.

Replaces `/root/reference/train.py`: builds a timestamped log dir and runs the
trainer. Example:
    python train.py --choice Chair --bs 64 --np 2048 --data_root data
"""

import os
import time

from sp_gan_tpu.config import parse_args
from sp_gan_tpu.utils import enable_compile_cache


def main():
    cfg = parse_args()
    enable_compile_cache()
    if cfg.log_dir == "log":  # default: timestamp it like the reference CLI
        stamp = time.strftime("%Y%m%d-%H%M")
        cfg = cfg.replace(log_dir=os.path.join("log", f"{stamp}-{cfg.choice}"))
    from sp_gan_tpu.train import Trainer

    Trainer(cfg).train()


if __name__ == "__main__":
    main()
