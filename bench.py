#!/usr/bin/env python
"""Benchmark: fused G+D training steps/sec at the reference's default config
(N=2048 points, bs=24 — `/root/reference/Generation/config.py:52-55`), run on
whatever accelerator jax exposes (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md), so vs_baseline is
computed against the first value this repo ever recorded on TPU
(bench_baseline.json, committed after the first TPU run) — i.e. our own r1
number is the running baseline.
"""

import json
import os
import time


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    def sync(x):
        """Force device completion via a host fetch of the smallest leaf.

        On the axon TPU relay `jax.block_until_ready` can return without
        waiting for execution (measured: an independent-dispatch auction
        timed 83714 "solves/s" under block_until_ready vs 53/s when each
        result was materialized). A host materialization always round-trips,
        so every timed region below ends with one. Fetching the LAST leaf
        (the most recently dispatched result) forces everything before it:
        a single chip executes its dispatch queue in order. Every call site
        below passes only small leaves (scalar metrics / distance rows).
        """
        np.asarray(jax.tree_util.tree_leaves(x)[-1])
        return x

    BS, N, T = 24, 2048, 8
    cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)

    data = SyntheticDataset(n_items=BS * T, n_points=N).data
    batches = jnp.asarray(data).reshape(T, BS, N, 3)

    # measure the production dispatch mode: one device call drives a
    # lax.scan chunk of T steps (what Trainer does via --steps_per_call).
    # A per-step python loop instead measures this environment's device
    # relay latency (~6 ms/dispatch) on top of the actual step.
    def chunk(state, batches):
        return jax.lax.scan(lambda st, b: step(st, b), state, batches)

    chunk = jax.jit(chunk, donate_argnums=0)

    # compile + warmup
    state, m = chunk(state, batches)
    sync(m)
    state, m = chunk(state, batches)
    sync(m)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = chunk(state, batches)
    sync(m)
    dt = time.perf_counter() - t0

    steps_per_sec = iters * T / dt
    points_per_sec = steps_per_sec * BS * N

    # secondary: CD / EMD evaluation throughput at the metric-protocol sizes
    # BASELINE.md quotes (96x96 CD matrix; EMD batch of 16 pairs)
    from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
    from sp_gan_tpu.ops.emd import emd_auction
    key = jax.random.PRNGKey(0)
    clouds = jax.random.normal(key, (96, N, 3), jnp.float32)
    cd_fn = jax.jit(lambda a, b: pairwise_cd_matrix(a, b))
    sync(cd_fn(clouds, clouds))
    t0 = time.perf_counter()
    r0 = cd_fn(clouds, clouds)
    r1 = cd_fn(clouds + 1e-6, clouds)
    r2 = cd_fn(clouds, clouds + 1e-6)
    sync((r0, r1, r2))
    cd_evals_per_sec = 3 * 96 * 96 / (time.perf_counter() - t0)

    gen = batches[0][:16]
    emd_fn = jax.jit(lambda a, b: emd_auction(a, b, 0.005, 50)[0])
    sync(emd_fn(gen, gen))
    t0 = time.perf_counter()
    r0 = emd_fn(gen, gen)
    r1 = emd_fn(gen + 1e-6, gen)
    r2 = emd_fn(gen, gen + 1e-6)
    sync((r0, r1, r2))
    emd_evals_per_sec = 3 * gen.shape[0] / (time.perf_counter() - t0)

    # metric-protocol EMD (eps=0.002, converged): VMEM-resident
    # epsilon-scaling auction (ops/pallas/auction.py); batch of 8 pairs
    gen8 = batches[0][:8]
    ref8 = batches[1][:8]
    emd_m_fn = jax.jit(lambda a, b: emd_auction(a, b, 0.002, 10000, True)[0])
    sync(emd_m_fn(gen8, ref8))
    t0 = time.perf_counter()
    r0 = emd_m_fn(gen8, ref8)
    r1 = emd_m_fn(ref8, gen8)
    sync((r0, r1))
    emd_metric_per_sec = 2 * gen8.shape[0] / (time.perf_counter() - t0)

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("steps_per_sec", steps_per_sec)
        vs = steps_per_sec / base

    print(json.dumps({
        "metric": "G+D train steps/sec (bs=24, 2048 pts)",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3),
        "baseline_note": "vs this repo's own r1 XLA build on 1 TPU chip "
                         "(bench_baseline.json); the reference publishes "
                         "no benchmark numbers",
        "points_per_sec": round(points_per_sec),
        "cd_evals_per_sec_96x96": round(cd_evals_per_sec, 1),
        "emd_evals_per_sec_b16": round(emd_evals_per_sec, 1),
        "emd_metric_solves_per_sec": round(emd_metric_per_sec, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
