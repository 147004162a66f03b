#!/usr/bin/env python
"""A/B the fused kNN+edge kernel's distance/selection modes by full-program
chunked step rate (micro wall-clocks are unreliable through this
environment's device relay; whole-dispatch rates are the honest measure).

Usage: python scripts/exp_knn_select.py [--dist highest|bf16_3x]
                                        [--select exact|packed]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dist", default="highest")
    ap.add_argument("--select", default="exact")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    os.environ["SPGAN_DIST_MODE"] = args.dist
    os.environ["SPGAN_KNN_SELECT"] = args.select

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    BS, N, T = 24, 2048, 8
    cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
    data = SyntheticDataset(n_items=BS * T, n_points=N).data
    batches = jnp.asarray(data).reshape(T, BS, N, 3)

    def chunk(state, batches):
        return jax.lax.scan(lambda st, b: step(st, b), state, batches)

    chunk = jax.jit(chunk, donate_argnums=0)
    state, m = chunk(state, batches)
    jax.block_until_ready(m)
    state, m = chunk(state, batches)
    jax.block_until_ready(m)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = chunk(state, batches)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "dist": args.dist, "select": args.select,
        "steps_per_sec": round(args.iters * T / dt, 2),
        "ms_per_step": round(1000 * dt / (args.iters * T), 2),
    }))


if __name__ == "__main__":
    main()
