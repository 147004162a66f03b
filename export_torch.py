#!/usr/bin/env python
"""CLI: export a checkpoint trained here as reference-format PyTorch `.pth`
files — the reverse of `--pretrain_model_G` warm-starting. The outputs load
into `/root/reference/Generation/Generator.py` / `Discriminator.py` modules
with `load_state_dict(strict=True)` (file format of `model.py:505-528`).

    python export_torch.py --log_dir runs/campaign_r3b --ema --out G.pth
    python export_torch.py --log_dir runs/run --out G.pth --out_d D.pth
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--ckpt", default=None, help="explicit .pkl path "
                   "(default: latest in log_dir)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA generator weights")
    p.add_argument("--out", default="G.pth")
    p.add_argument("--out_d", default=None,
                   help="also export the discriminator to this path")
    args = p.parse_args()

    import jax
    import numpy as np

    from sp_gan_tpu.compat import save_reference_checkpoint
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.train import create_train_state
    from sp_gan_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from sp_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    with open(os.path.join(args.log_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    ckpt = args.ckpt or latest_checkpoint(args.log_dir)
    assert ckpt, f"no checkpoint in {args.log_dir}"
    template, *_ = create_train_state(cfg, jax.random.PRNGKey(0))
    state, epoch = load_checkpoint(ckpt, template)
    g_params = state.g_params
    if args.ema:
        if state.g_ema is None:
            raise SystemExit(f"{ckpt} holds no EMA weights "
                             "(trained without --ema)")
        g_params = state.g_ema

    to_np = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    save_reference_checkpoint(
        args.out, to_np(g_params), to_np(state.g_stats), cfg, epoch=epoch,
        d_path=args.out_d,
        d_params=to_np(state.d_params) if args.out_d else None,
        d_stats=to_np(state.d_stats) if args.out_d else None)
    print(f"exported {ckpt} (epoch {epoch}"
          f"{', EMA' if args.ema else ''}) -> {args.out}"
          + (f" + {args.out_d}" if args.out_d else ""))


if __name__ == "__main__":
    main()
