#!/usr/bin/env python
"""Serving batch-size sweep (round 4): clouds/s vs batch size at the
device-ceiling (scan) protocol, N=2048, default mixed_edge serving path.

Production serving wants the throughput-optimal dispatch shape; the
reference has no serving story at all (visual.py generates one batch at a
time, model_test.py:139-203). Timing: all `iters` batches inside ONE
lax.scan program (relay-RTT-free — BASELINE.md r4 measurement note), z
sampled in-scan, host fetch of the last slice forces completion.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np

    import jax.numpy as jnp
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import sphere_template
    from sp_gan_tpu.data.noise import sample_z
    from sp_gan_tpu.train import create_train_state
    from sp_gan_tpu.train.step import make_sample_fn

    N = 2048
    for BS in (8, 16, 32, 64, 128, 256):
        cfg = Config(np=N, bs=BS, nk=20, nz=128, dtype="mixed_edge",
                     donate_state=False)
        state, G, D, g_tx, d_tx = create_train_state(
            cfg, jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(N))
        sample = make_sample_fn(cfg, G, sphere)
        # enough scanned batches to hit ~1s+ of device time per dispatch
        iters = max(4, min(64, 4096 // BS))

        @jax.jit
        def scan_fn(st, ks):
            def body(c, k):
                zk = sample_z(k, BS, N, cfg.nz, cfg.nv)
                return c, sample(st, zk)[:, 0]
            return jax.lax.scan(body, 0, ks)[1]

        keys = jax.random.split(jax.random.PRNGKey(7), iters)
        np.asarray(scan_fn(state, keys)[-1, 0])  # warm compile
        times = []
        for rep in range(3):
            k2 = jax.random.split(jax.random.PRNGKey(11 + rep), iters)
            t0 = time.perf_counter()
            np.asarray(scan_fn(state, k2)[-1, 0])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(json.dumps({
            "measure": f"serving scan N={N} bs={BS} mixed_edge",
            "clouds_per_sec": round(iters * BS / dt, 1),
            "ms_per_batch": round(1000 * dt / iters, 2),
            "scanned_batches": iters}), flush=True)


if __name__ == "__main__":
    main()
