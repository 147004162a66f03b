#!/usr/bin/env python
"""Large-N kNN timing (VERDICT r1 #10 done-criterion: N=20000 within 2x of
the N=8192 per-point cost) + eval/serving generation rate at bs=64 with the
round-2 kernels.

Usage: python scripts/bench_largen.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(fn, *args, iters=10):
    import jax
    import numpy as _np

    def sync(o):
        # device_get forces completion; block_until_ready alone has been
        # observed returning early through the device relay for small
        # programs
        leaf = jax.tree_util.tree_leaves(o)[0]
        _np.asarray(leaf[(0,) * (leaf.ndim - 1)])

    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    print("device:", jax.devices()[0], flush=True)

    from sp_gan_tpu.ops.pallas.knn import knn_pallas, knn_pallas_blocked

    # chunked serial loop so relay latency amortizes
    def many(fn, x, k, reps=4):
        def body(c, _):
            idx, _d = fn(c, k)
            # serial dependency the compiler cannot fold away (0.0*x would
            # be DCE'd along with the whole kNN call)
            eps = (idx.sum().astype(c.dtype) * 1e-30)
            return c + eps, None
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=reps)[0])

    for N, fn, name in ((2048, knn_pallas, "dense"),
                        (8192, knn_pallas, "dense"),
                        (8192, knn_pallas_blocked, "blocked"),
                        (16384, knn_pallas_blocked, "blocked"),
                        (20480, knn_pallas_blocked, "blocked")):
        B = max(1, 24 * 2048 // N)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
        f = many(fn, x, 10)
        dt = time_fn(f, x, iters=5) / 4
        per_pt = dt / (B * N) * 1e9
        print(f"kNN {name:>8} N={N:>6} B={B}: {dt*1e3:7.2f} ms "
              f"({per_pt:6.1f} ns/pt)", flush=True)

    # serving: eval-mode generation at bs=64 (fused eval path)
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import sphere_template
    from sp_gan_tpu.train import create_train_state
    from sp_gan_tpu.train.step import make_sample_fn
    for N in (2048, 8192):
        BS = 64 if N == 2048 else 16
        cfg = Config(np=N, bs=BS, nk=20, nz=128)
        state, G, D, g_tx, d_tx = create_train_state(cfg,
                                                     jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(N))
        sample = make_sample_fn(cfg, G, sphere)
        z = jnp.broadcast_to(
            0.2 * jax.random.normal(jax.random.PRNGKey(1), (BS, 1, cfg.nz)),
            (BS, N, cfg.nz))
        dt = time_fn(lambda z: sample(state, z), z, iters=10)
        print(f"eval generation N={N} bs={BS}: {dt*1e3:.1f} ms/batch "
              f"({BS/dt:.0f} clouds/s, {BS*N/dt/1e6:.2f}M pts/s)", flush=True)


if __name__ == "__main__":
    main()
