#!/usr/bin/env python
"""Convert reference SP-GAN `.pth` checkpoints into this framework's format.

    python scripts/convert_reference_checkpoint.py \
        --g 300_Chair_G.pth [--d 300_Chair_D.pth] \
        --out log/imported [--np 2048] [--eql] [--attn] [--use_head]

Produces a standard `ckpt_epoch_<N>.pkl` + `config.json` under --out, ready
for generate.py / manipulate.py / evaluate.py — the output-fidelity bridge of
BASELINE.json's north star (fresh optimizer state; training can resume from
the imported weights).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--g", required=True, help="reference *_G.pth")
    p.add_argument("--d", default=None, help="reference *_D.pth")
    p.add_argument("--out", required=True)
    p.add_argument("--np", type=int, default=2048)
    p.add_argument("--nk", type=int, default=20)
    p.add_argument("--nz", type=int, default=128)
    p.add_argument("--eql", action="store_true")
    p.add_argument("--attn", action="store_true")
    p.add_argument("--use_head", action="store_true")
    p.add_argument("--small_d", action="store_true")
    args = p.parse_args()

    import jax
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.compat import load_reference_checkpoint
    from sp_gan_tpu.train.checkpoint import save_checkpoint
    from sp_gan_tpu.train.state import create_train_state

    cfg = Config(np=args.np, nk=args.nk, nz=args.nz, eql=args.eql,
                 attn=args.attn, use_head=args.use_head, small_d=args.small_d,
                 dtype="float32")  # f32 for bit-parity with the reference
    (g_params, g_stats), d, epoch = load_reference_checkpoint(
        args.g, cfg, args.d)

    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(g_params=g_params, g_stats=g_stats)
    if d is not None:
        state = state.replace(d_params=d[0], d_stats=d[1])

    os.makedirs(args.out, exist_ok=True)
    path = save_checkpoint(args.out, state, epoch, cfg)
    print(f"imported reference checkpoint (epoch {epoch}) -> {path}")


if __name__ == "__main__":
    main()
