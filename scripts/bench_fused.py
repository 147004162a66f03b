#!/usr/bin/env python
"""On-device A/B of the fused train-mode EdgeBlock path vs the XLA default.

Runs the full jitted G+D step at the reference default config for each
variant and reports ms/step (serial-dependency loop, 20+ iters — single
dispatch timings are meaningless through this environment's device relay).
Also on-chip-validates the fused backward against the XLA autodiff oracle
at real dims before timing.

Usage: python scripts/bench_fused.py [--skip-check] [--variants a,b,c]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_step(cfg_kwargs, iters=20, bs=24, n=2048):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    BS, N = bs, n
    cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True, **cfg_kwargs)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
    batch = jnp.asarray(SyntheticDataset(n_items=BS, n_points=N).data)

    t0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    # host fetch, not block_until_ready: the audited relay-safe sync
    float(m["d_loss"])
    dt = (time.perf_counter() - t0) / iters
    metrics = {k: float(v) for k, v in m.items()}
    return dt * 1e3, compile_s, metrics


def check_bwd_on_chip():
    """Fused backward vs XLA autodiff oracle, real dims, on the real chip.

    Forces HIGHEST matmul precision globally for the duration — TPU
    "default" f32 matmuls run reduced-precision bf16 passes on both the
    oracle and the kernels, which buries the signal the check looks for."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    from sp_gan_tpu.nn.layers import EdgeBlock
    from sp_gan_tpu.ops import edge_features
    from sp_gan_tpu.ops.pallas.edgeblock_train import (
        edge_block_train_backward, edge_block_train_stats,
        edge_block_train_forward)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_edgeblock_train_fused import xla_block_from_ee

    B, N, C, F, k = 8, 2048, 64, 128, 10
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C))
    blk = EdgeBlock(C, F, k)
    variables = blk.init(jax.random.PRNGKey(1), x, True)
    params = variables["params"]
    ee = edge_features(x, k)
    cot = jax.random.normal(jax.random.PRNGKey(5), (B, N, F))

    d_params_o, d_ee_o = jax.jit(jax.grad(
        lambda p, e: jnp.sum(xla_block_from_ee(p, e, k) * cot),
        argnums=(0, 1)))(params, ee)

    ok = True
    for dtype, rtol in ((jnp.float32, 5e-3), (jnp.bfloat16, 6e-2)):
        eed = ee.astype(dtype)
        out, stats = edge_block_train_forward(params, eed, k)
        d_params, d_ee = edge_block_train_backward(params, eed, stats, cot, k)
        rel = float(jnp.linalg.norm(d_ee.astype(jnp.float32) - d_ee_o)
                    / jnp.linalg.norm(d_ee_o))
        print(f"  d_ee rel ({dtype.__name__}): {rel:.2e}", flush=True)
        ok &= rel < rtol
        for pth, leaf in jax.tree_util.tree_leaves_with_path(d_params):
            name = jax.tree_util.keystr(pth)
            if "bias" in name and "bn" not in name and "out" not in name:
                continue
            oref = dict(jax.tree_util.tree_leaves_with_path(d_params_o))[pth]
            r = float(jnp.linalg.norm(leaf - oref)
                      / (jnp.linalg.norm(oref) + 1e-8))
            if r > rtol * 3:
                print(f"  MISMATCH {name} ({dtype.__name__}): rel {r:.2e}",
                      flush=True)
                ok = False
    print("backward on-chip check:", "PASS" if ok else "FAIL", flush=True)
    jax.config.update("jax_default_matmul_precision", None)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--variants", default="default,fused,dphase")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bs", type=int, default=24)
    ap.add_argument("--np", dest="n", type=int, default=2048)
    args = ap.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    print("device:", jax.devices()[0], flush=True)

    if not args.skip_check:
        if not check_bwd_on_chip():
            print("oracle check failed — timing anyway", flush=True)

    variants = {
        "default": {},
        "fused": {"fused_train": True, "fused_dphase": True},
        "dphase": {"fused_dphase": True},
        "fused_f32": {"fused_train": True, "fused_dphase": True,
                      "dtype": "float32"},
        "f32": {"dtype": "float32"},
        "bf16g": {"dtype": "bfloat16_g"},
        "bf16": {"dtype": "bfloat16"},
        "remat": {"remat": True},
    }
    for name in args.variants.split(","):
        ms, comp, metrics = time_step(variants[name], args.iters,
                                      bs=args.bs, n=args.n)
        print(f"{name} (bs={args.bs}, N={args.n}): {ms:.1f} ms/step "
              f"({1e3/ms:.1f} steps/s, {args.bs*args.n/ms*1e3/1e3:.0f}k pts/s, "
              f"compile {comp:.0f}s) metrics={metrics}", flush=True)


if __name__ == "__main__":
    main()
