#!/usr/bin/env python
"""End-of-round measurement sweep (run with the TPU free): serving rates,
N=8192 training, blockgs auction at N=4096, all with the r3 default kernels.
Prints one JSON line per measurement."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step
    from sp_gan_tpu.train.step import make_sample_fn
    from sp_gan_tpu.data.noise import sample_z

    # ---- serving at N=2048 (bs=64) and N=8192 (bs=8) ----
    for N, BS in ((2048, 64), (8192, 8)):
        cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=False)
        state, G, D, g_tx, d_tx = create_train_state(
            cfg, jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(N))
        sample = make_sample_fn(cfg, G, sphere)
        z = sample_z(jax.random.PRNGKey(1), BS, N, cfg.nz, cfg.nv)
        out = sample(state, z)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = sample(state, z)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"measure": f"serving N={N} bs={BS}",
                          "clouds_per_sec": round(iters * BS / dt, 1),
                          "ms_per_batch": round(1000 * dt / iters, 2)}))

    # ---- N=8192 training rate ----
    BS, N, T = 4, 8192, 4
    cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
    data = SyntheticDataset(n_items=BS * T, n_points=N).data
    batches = jnp.asarray(data).reshape(T, BS, N, 3)
    chunk = jax.jit(lambda st, b: jax.lax.scan(
        lambda s, x: step(s, x), st, b), donate_argnums=0)
    state, m = chunk(state, batches)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, m = chunk(state, batches)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    sps = iters * T / dt
    print(json.dumps({"measure": "train N=8192 bs=4",
                      "steps_per_sec": round(sps, 2),
                      "points_per_sec": round(sps * BS * N)}))

    # ---- default-config step rate, mixed_edge vs bfloat16_g A/B ----
    for dt_mode in ("mixed_edge", "bfloat16_g"):
        BS, N, T = 24, 2048, 8
        cfg = Config(np=N, bs=BS, nk=20, nz=128, dtype=dt_mode,
                     donate_state=True)
        state, G, D, g_tx, d_tx = create_train_state(
            cfg, jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(N))
        step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
        data = SyntheticDataset(n_items=BS * T, n_points=N).data
        batches = jnp.asarray(data).reshape(T, BS, N, 3)
        chunk = jax.jit(lambda st, b: jax.lax.scan(
            lambda s, x: step(s, x), st, b), donate_argnums=0)
        state, m = chunk(state, batches)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        iters = 16
        for _ in range(iters):
            state, m = chunk(state, batches)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        sps = iters * T / dt
        print(json.dumps({"measure": f"train N=2048 bs=24 dtype={dt_mode}",
                          "steps_per_sec": round(sps, 2),
                          "ms_per_step": round(1000 / sps, 2)}))

    # ---- blockgs auction at N=4096 (VMEM ceiling probe) ----
    from sp_gan_tpu.ops.pairwise import pairwise_sqdist
    from sp_gan_tpu.ops.pallas.auction import auction_assignment_pallas
    data = SyntheticDataset(n_items=8, n_points=4096).data
    d = pairwise_sqdist(jnp.asarray(data[:4]), jnp.asarray(data[4:8]))
    try:
        f = jax.jit(lambda dd: auction_assignment_pallas(
            dd, 0.002, 10000, mode="blockgs", block_w=64))
        r = f(d)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(d)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        asg = np.asarray(r)
        uniq = min(len(set(asg[i])) for i in range(4))
        print(json.dumps({"measure": "blockgs EMD N=4096 (4 pairs)",
                          "solves_per_sec": round(4 / dt, 2),
                          "min_uniq": uniq}))
    except Exception as e:  # noqa: BLE001 — record the ceiling, don't die
        print(json.dumps({"measure": "blockgs EMD N=4096",
                          "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
