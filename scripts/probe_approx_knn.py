#!/usr/bin/env python
"""Approximate kNN study for large-N training (VERDICT r4 next-round #5).

The generator's second EdgeConv selects k neighbors in 64-d feature space
with an exact all-pairs scan (`modules.py:694-703` contract) — O(N^2) per
forward, the dominant cost at N=8192 (exact kernel holds 0.030 ns/pair, so
pairs grow 16x from N=2048 while useful work grows 4x).

Hypothesis: x1 features are smooth over the sphere template (they come from
template-local EdgeConv1 + per-point style whose z is broadcast), so
feature-space neighbors are overwhelmingly TEMPLATE neighbors — and the
fibonacci template's spiral ordering makes template neighbors INDEX
neighbors, so a banded (windowed) selection over index space needs no
gathers at all: contiguous slices + block matmuls.

Stage 1 (this script, --stage recall): measured neighbor-set recall of
  (a) template-kNN candidate pruning (top-C template neighbors), and
  (b) index-window pruning (|i - j| <= W circularly),
against the exact selection, on the REAL x1 features of the trained N=8192
checkpoint (not random features — trained features are what the contract
must hold for).

Stage 2 (--stage steps): full-program train-step A/B (exact vs approx) at
N=8192 bs=4 on the TPU, relay-safe timing.

Usage:
    python scripts/probe_approx_knn.py --stage recall
    python scripts/probe_approx_knn.py --stage steps
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_x1(ckpt, config, n_batch):
    """x1 (adain1 output — EdgeConv2's input) from the trained checkpoint."""
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import sphere_template
    from sp_gan_tpu.data.noise import sample_z
    from sp_gan_tpu.nn import Generator

    with open(config) as f:
        cfg = Config.from_json(f.read())
    cfg = cfg.replace(dtype="float32", use_pallas=False)
    with open(ckpt, "rb") as f:
        st = pickle.load(f)["state"]
    x = np.broadcast_to(sphere_template(cfg.np, cfg.template)[None],
                        (n_batch, cfg.np, 3)).astype(np.float32).copy()
    z = np.asarray(sample_z(jax.random.PRNGKey(5), n_batch, cfg.np, cfg.nz,
                            cfg.nv, cfg.n_rand), np.float32)
    G = Generator(cfg)
    _, inter = G.apply(
        {"params": st["g_params"], "batch_stats": st["g_stats"]},
        jnp.array(x), jnp.array(z), train=False,
        capture_intermediates=lambda mdl, _: mdl.name == "adain1")
    x1 = np.asarray(jax.tree.leaves(inter)[0])
    return cfg, np.asarray(sphere_template(cfg.np, cfg.template)), x1


def stage_recall(args):
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.ops.approx_knn import (knn_indices_candidates,
                                           knn_indices_window,
                                           template_candidates)
    from sp_gan_tpu.ops.pairwise import knn_indices

    cfg, template, x1 = load_x1(args.ckpt, args.config, args.n_batch)
    k = cfg.nk // 2
    B, N, C = x1.shape
    print(f"# x1 features {x1.shape} k={k} from {args.ckpt}", flush=True)

    exact = np.asarray(knn_indices(jnp.asarray(x1), k))       # [B, N, k]

    def recall(approx):
        hits = 0
        for b in range(B):
            for i in range(0, N, 7):      # every 7th point: 1170 queries
                hits += len(np.intersect1d(exact[b, i], approx[b, i],
                                           assume_unique=False))
        return hits / (B * len(range(0, N, 7)) * k)

    results = []
    for Ccand in args.cands:
        cand = template_candidates(template, Ccand)
        idx = np.asarray(knn_indices_candidates(jnp.asarray(x1), k,
                                                jnp.asarray(cand)))
        r = recall(idx)
        results.append({"method": "template_cand", "C": Ccand,
                        "recall": round(r, 4)})
        print(results[-1], flush=True)
    for W in args.windows:
        idx = np.asarray(knn_indices_window(jnp.asarray(x1), k, W))
        r = recall(idx)
        results.append({"method": "window", "W": W, "recall": round(r, 4)})
        print(results[-1], flush=True)
    with open(args.out, "a") as f:
        for r in results:
            f.write(json.dumps({"stage": "recall", **r}) + "\n")


def stage_steps(args):
    """Full-program A/B at N=8192 bs=4: exact vs approx edge2 selection.
    Relay-safe: chained-state loop, distinct inputs, host-fetch sync."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    BS, N = args.bs, args.N
    data = SyntheticDataset(n_items=64, n_points=N).data
    rng = np.random.default_rng(0)

    results = []
    for mode in args.modes.split(","):
        cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True,
                     knn_mode=mode)
        state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, G, D, g_tx, d_tx,
                               jnp.asarray(sphere_template(N)))
        data_dev = jax.device_put(jnp.asarray(data))

        idx = rng.integers(0, len(data), BS)
        state, m = step(state, jnp.take(data_dev, jnp.asarray(idx), axis=0))
        float(m["d_loss"])                     # compile + host-fetch sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            idx = rng.integers(0, len(data), BS)
            state, m = step(state, jnp.take(data_dev, jnp.asarray(idx),
                                            axis=0))
        float(m["d_loss"])
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"stage": "steps", "mode": mode, "N": N, "bs": BS,
               "steps_per_sec": round(1 / dt, 2),
               "points_per_sec": round(BS * N / dt),
               "ms_per_step": round(dt * 1e3, 1),
               "final": {k: float(v) for k, v in m.items()}}
        if args.probe_steps:
            # short-train quality probe (same program -> no new compile):
            # MMD-CD of 48 samples vs 48 held-out clouds after probe_steps
            from sp_gan_tpu.data.augment import normalize_point_cloud
            from sp_gan_tpu.data.noise import sample_z
            from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
            from sp_gan_tpu.train.step import make_sample_fn
            for _ in range(args.probe_steps - args.iters - 1):
                idx = rng.integers(0, len(data), BS)
                state, m = step(state, jnp.take(data_dev, jnp.asarray(idx),
                                                axis=0))
            float(m["d_loss"])
            sample = make_sample_fn(cfg, G, jnp.asarray(sphere_template(N)),
                                    use_ema=cfg.ema)
            outs = []
            key = jax.random.PRNGKey(99)
            for lo in range(0, 48, BS):
                key, kz = jax.random.split(key)
                zb = sample_z(kz, BS, N, cfg.nz, cfg.nv, cfg.n_rand)
                outs.append(np.asarray(sample(state, zb)))
            gen = np.asarray(normalize_point_cloud(np.concatenate(outs)))
            ref = np.asarray(normalize_point_cloud(
                SyntheticDataset(n_items=48, n_points=N, seed=7).data))
            gt = np.asarray(pairwise_cd_matrix(jnp.asarray(gen),
                                               jnp.asarray(ref)))
            rec["probe_steps"] = args.probe_steps
            rec["probe_mmd_cd"] = float(gt.min(axis=0).mean())
        results.append(rec)
        print(rec, flush=True)
    with open(args.out, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["recall", "steps"], required=True)
    p.add_argument("--ckpt", default="runs/keep/campaign_n8192_latest.pkl")
    p.add_argument("--config", default="runs/campaign_n8192/config.json")
    p.add_argument("--n_batch", type=int, default=4)
    p.add_argument("--cands", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--windows", type=int, nargs="+", default=[128, 256, 512])
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--N", type=int, default=8192)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--probe_steps", type=int, default=0,
                   help="continue to this many total steps, then MMD-CD")
    p.add_argument("--modes", default="exact,approx")
    p.add_argument("--out", default="runs/probe_approx_knn.jsonl")
    args = p.parse_args()
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    if args.stage == "recall":
        stage_recall(args)
    else:
        stage_steps(args)


if __name__ == "__main__":
    main()
