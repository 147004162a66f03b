#!/usr/bin/env python
"""Capture an xprof device trace of the train step and print the op_profile
time breakdown (the round-1 trace recipe — wall timings through the axon
relay are meaningless, rawTime from the device trace is ground truth).

Usage: python scripts/trace_step.py [variant] [out_dir]
  variant: default | fused | dphase | f32 (cfg preset, see bench_fused.py)
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = {
    "default": {},
    "fused": {"fused_train": True, "fused_dphase": True},
    "dphase": {"fused_dphase": True},
    "f32": {"dtype": "float32"},
    "bf16g": {"dtype": "bfloat16_g"},
    "bf16": {"dtype": "bfloat16"},
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "default"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_{variant}"

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import SyntheticDataset, sphere_template
    from sp_gan_tpu.train import create_train_state, make_train_step

    BS, N = 24, 2048
    cfg = Config(np=N, bs=BS, nk=20, nz=128, donate_state=True,
                 **VARIANTS[variant])
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(N))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
    batch = jnp.asarray(SyntheticDataset(n_items=BS, n_points=N).data)

    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)

    jax.profiler.start_trace(out)
    for _ in range(5):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                        recursive=True)
    print("trace:", xplanes, flush=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    blob = json.loads(data)

    def walk(node, depth, budget):
        raw = node.get("metrics", {}).get("rawTime", 0)
        name = node.get("name", "?")
        if raw and depth <= 3:
            print(f"{'  '*depth}{name}: {raw/1e9/5:.2f} ms/step "
                  f"({node.get('metrics',{}).get('time',0):.1f}%)")
        for ch in node.get("children", [])[:budget]:
            walk(ch, depth + 1, budget)

    root = blob.get("byProgramExcludeIdle", blob)
    walk(root, 0, 12)


if __name__ == "__main__":
    main()
