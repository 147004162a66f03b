#!/usr/bin/env python
"""Serving-precision probe (round 4): eval-mode sample throughput and
geometric fidelity for f32 vs bf16 generator trunks.

Training needs f32 in the discriminator (BASELINE.md bf16 study), but
SERVING runs only the generator in eval mode — if a bf16 trunk is
geometrically neutral there, it is free HBM-bandwidth savings on the
serving path. For each dtype this measures clouds/s at the two serving
regimes (N=2048 bs=64, N=8192 bs=8) and the mean Chamfer displacement of
its outputs vs the f32 outputs for the SAME z draws (deterministic
comparison, no training noise). Prints one JSON line per (regime, dtype).
Run with the TPU free.
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
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import sphere_template
    from sp_gan_tpu.data.noise import sample_z
    from sp_gan_tpu.ops.chamfer import chamfer
    from sp_gan_tpu.train import create_train_state
    from sp_gan_tpu.train.step import make_sample_fn

    for N, BS in ((2048, 64), (8192, 8)):
        ref_out = None
        for dt in ("float32", "mixed_edge", "bfloat16_g"):
            cfg = Config(np=N, bs=BS, nk=20, nz=128, dtype=dt,
                         donate_state=False)
            # same init seed across dtypes -> same weights, comparable
            # geometry
            state, G, D, g_tx, d_tx = create_train_state(
                cfg, jax.random.PRNGKey(0))
            sphere = jnp.asarray(sphere_template(N))
            sample = make_sample_fn(cfg, G, sphere)
            z = sample_z(jax.random.PRNGKey(1), BS, N, cfg.nz, cfg.nv)
            out = sample(state, z)
            # force completion with a host fetch: on the axon relay
            # block_until_ready can return before execution finishes
            # (see bench.py::sync); fetching one row of the LAST dispatch
            # forces the whole in-order queue.
            np.asarray(out[0, 0])
            # distinct z per timed dispatch: identical re-dispatched args
            # can be served memoized by the relay (measured in the large-N
            # auction sweep, runs/sweep_auction_largen_r1dispatch.jsonl)
            iters = 20
            zs = [sample_z(jax.random.PRNGKey(2 + i), BS, N, cfg.nz, cfg.nv)
                  for i in range(iters)]
            t0 = time.perf_counter()
            for i in range(iters):
                out = sample(state, zs[i])
            np.asarray(out[0, 0])
            dt_s = time.perf_counter() - t0

            # device-ceiling measurement: the loop above pays the relay's
            # per-dispatch round trip, so it is a serving-LATENCY floor.
            # One scanned program = one dispatch for all `iters` batches
            # -> pure device throughput (z sampling in-scan, negligible).
            @jax.jit
            def scan_fn(st, ks):
                def body(c, k):
                    zk = sample_z(k, BS, N, cfg.nz, cfg.nv)
                    return c, sample(st, zk)[:, 0]
                return jax.lax.scan(body, 0, ks)[1]
            keys = jax.random.split(jax.random.PRNGKey(7), iters)
            np.asarray(scan_fn(state, keys)[-1, 0])  # warm compile
            t0 = time.perf_counter()
            r = scan_fn(state, keys)
            np.asarray(r[-1, 0])
            dt_scan = time.perf_counter() - t0
            if dt == "float32":
                ref_out = out
                drift = 0.0
            else:
                d1, d2 = chamfer(out.astype(jnp.float32), ref_out)
                drift = float((jnp.mean(d1) + jnp.mean(d2)) / 2)
            print(json.dumps({
                "measure": f"serving N={N} bs={BS} dtype={dt}",
                "clouds_per_sec": round(iters * BS / dt_s, 1),
                "ms_per_batch": round(1000 * dt_s / iters, 2),
                "clouds_per_sec_scan": round(iters * BS / dt_scan, 1),
                "ms_per_batch_scan": round(1000 * dt_scan / iters, 2),
                "chamfer_vs_f32": round(drift, 8)}), flush=True)


if __name__ == "__main__":
    main()
