#!/usr/bin/env python
"""Short-run GAN quality probe (the round-1 methodology, now a script):
train N steps on a synthetic dataset, then report MMD-CD of 96 samples vs
96 held-out data clouds, plus D/G accuracy balance at the end.

Used for the bf16 stability study (VERDICT r1 #6): which parts of the model
can run bf16 without letting D overpower G.

Usage: python scripts/probe_quality.py [--steps 500] [--variants a,b,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def probe(variant: str, steps: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.data.augment import normalize_point_cloud
    from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
    from sp_gan_tpu.train import create_train_state, make_train_step
    from sp_gan_tpu.train.step import make_sample_fn

    BS, N = 24, 2048
    # variant = "<dtype>[+flag ...]" where each flag is a boolean Config
    # field, e.g. "mixed_edge+n_mix" or "mixed_edge+n_rand" (the reference's
    # noise_generator options, model.py:122-154)
    parts = variant.split("+")
    dtype, flags = parts[0], {f: True for f in parts[1:]}
    cfg = Config(np=N, bs=BS, nk=20, nz=128, dtype=dtype, donate_state=True,
                 **flags)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(seed))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)

    data = SyntheticDataset(n_items=240, n_points=N).data
    data_dev = jax.device_put(jnp.asarray(data))
    rng = np.random.default_rng(seed)

    # relay-safe timing (see memory/axon-relay-timing + BASELINE.md r4
    # measurement note): warm up past the compile, time a chained-state
    # loop with DISTINCT inputs, and sync via a HOST FETCH of the last
    # result — block_until_ready alone can return before relayed
    # dispatches execute
    idx = rng.integers(0, len(data), BS)
    state, m = step(state, jnp.take(data_dev, jnp.asarray(idx), axis=0))
    np.asarray(m["d_loss"])
    t0 = time.perf_counter()
    for s in range(steps):
        idx = rng.integers(0, len(data), BS)
        state, m = step(state, jnp.take(data_dev, jnp.asarray(idx), axis=0))
    np.asarray(m["d_loss"])
    dt = time.perf_counter() - t0

    sample = make_sample_fn(cfg, G, sphere)
    outs = []
    key = jax.random.PRNGKey(seed + 1)
    for lo in range(0, 96, 32):
        key, kz = jax.random.split(key)
        z = jnp.broadcast_to(
            cfg.nv * jax.random.normal(kz, (32, 1, cfg.nz)), (32, N, cfg.nz))
        outs.append(np.asarray(sample(state, z)))
    gen = np.asarray(normalize_point_cloud(np.concatenate(outs)))
    ref = np.asarray(normalize_point_cloud(data[:96]))
    d_gt = np.asarray(pairwise_cd_matrix(jnp.asarray(gen), jnp.asarray(ref)))
    mmd_cd = float(d_gt.min(axis=0).mean())          # MMD: ref -> closest gen
    metrics = {k: float(v) for k, v in m.items()}
    return {"variant": variant, "steps": steps,
            "steps_per_sec": round(steps / dt, 2),
            "mmd_cd": round(mmd_cd, 5),
            "real_acc": round(metrics["real_acc"], 3),
            "fake_acc": round(metrics["fake_acc"], 3),
            "d_loss": round(metrics["d_loss"], 4),
            "g_loss": round(metrics["g_loss"], 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--variants",
                    default="mixed_edge,bfloat16,bfloat16_g,bfloat16_d,"
                            "bfloat16_tail32")
    args = ap.parse_args()
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    for v in args.variants.split(","):
        print(probe(v, args.steps), flush=True)


if __name__ == "__main__":
    main()
