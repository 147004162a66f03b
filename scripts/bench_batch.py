#!/usr/bin/env python
"""Batch-size scaling study (VERDICT r1 #3): bare jitted step vs end-to-end
Trainer at bs in {24, 64, 128}, reporting steps/s and points/s so the
points/s-vs-bs curve and the input-pipeline gap are measured, not guessed.

Usage: python scripts/bench_batch.py [--sizes 24,64,128] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bare_step(bs, n, iters):
    import jax
    import jax.numpy as jnp
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    cfg = Config(np=n, bs=bs, nk=20, nz=128, donate_state=True)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, G, D, g_tx, d_tx,
                           jnp.asarray(sphere_template(n)))
    batch = jnp.asarray(SyntheticDataset(n_items=bs, n_points=n).data)
    state, m = step(state, batch)
    jax.block_until_ready(m)
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    # host fetch, not block_until_ready: the audited relay-safe sync
    float(m["d_loss"])
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def trainer_rate(bs, n, steps):
    """Per-step rate of the end-to-end Trainer loop. Measured as the
    DIFFERENCE between a 2-epoch and a 1-epoch train() call so the per-call
    fixed costs (final checkpoint device_get+pickle through the device
    relay, python setup) cancel and only the steady-state epoch remains."""
    import jax
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset
    from sp_gan_tpu.train import Trainer

    cfg = Config(np=n, bs=bs, nk=20, nz=128, donate_state=True,
                 max_epoch=1, log_dir=f"/tmp/bb_{bs}", log_every=10 ** 9,
                 snapshot=10 ** 9, steps_per_epoch=steps)
    ds = SyntheticDataset(n_items=bs * steps, n_points=n)
    tr = Trainer(cfg, dataset=ds)
    tr.train(max_epoch=1)      # compile + warmup epoch
    t0 = time.perf_counter()
    tr.train(max_epoch=1)      # 1 epoch + fixed costs
    t1 = time.perf_counter()
    tr.train(max_epoch=2)      # 2 epochs + fixed costs
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / steps
    return 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="24,64,128")
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()

    for bs in [int(s) for s in args.sizes.split(",")]:
        r_bare = bare_step(bs, args.n, args.iters)
        r_tr = trainer_rate(bs, args.n, max(args.iters, 40))
        print(f"bs={bs:>4}: bare {r_bare:6.2f} steps/s "
              f"({r_bare * bs * args.n / 1e6:.2f}M pts/s) | trainer "
              f"{r_tr:6.2f} steps/s ({r_tr * bs * args.n / 1e6:.2f}M pts/s) "
              f"| gap {100 * (1 - r_tr / r_bare):.0f}%", flush=True)


if __name__ == "__main__":
    main()
