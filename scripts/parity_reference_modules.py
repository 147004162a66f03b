#!/usr/bin/env python
"""One-shot parity artifact against the ACTUAL upstream modules (VERDICT r4
item #1): take a TRAINED checkpoint, export it with `compat.torch_export`,
load it into the genuine `/root/reference/Generation/Generator.py` /
`Discriminator.py` with `strict=True`, and compare same-input outputs.
Writes `runs/parity_reference_modules.json`.

Three measurements, because at a trained N=2048 checkpoint the dominant
divergence source is *neighbor-selection ambiguity*, not compute:

  unpinned   — both stacks pick their own kNN (reference: plain torch.sort,
               modules.py:702; ours: production top-k). Feature-space
               near-ties (gaps below f32 pairwise-distance noise) resolve
               differently, so some points take different edges.
  pinned     — `Generation.Generator.get_edge_features` is wrapped to
               delegate neighbor SELECTION to this framework's
               `ops.pairwise.knn_indices` (run on the reference's own torch
               activations) while every reference weight/op stays genuine.
               With identical neighbor sets, any residual gap is real
               compute divergence — this is the load-bearing number.
  tie_control— the UNMODIFIED reference vs itself with an equally-valid
               tie order (stable argsort instead of torch.sort). Shows how
               much output the reference's own outputs move under
               tie-ambiguity alone; the unpinned gap should be the same
               scale, attributing it to the architecture, not to us.

The discriminator has no kNN and must (and does) match to float noise.

    python scripts/parity_reference_modules.py \
        [--ckpt runs/keep/campaign_r3b_latest.pkl] \
        [--config runs/campaign_r3b/config.json]
"""

import argparse
import json
import os
import pickle
import sys

os.environ.setdefault("SPGAN_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/keep/campaign_r3b_latest.pkl")
    p.add_argument("--config", default="runs/campaign_r3b/config.json")
    p.add_argument("--n", type=int, default=8, help="batch of clouds to compare")
    p.add_argument("--out", default="runs/parity_reference_modules.json")
    args = p.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sp_gan_tpu.compat import export_discriminator, export_generator
    from sp_gan_tpu.compat.reference_import import (load_reference_modules,
                                                    make_opts)
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.data import sphere_template
    from sp_gan_tpu.data.noise import sample_z
    from sp_gan_tpu.nn import Discriminator, Generator
    from sp_gan_tpu.ops import chamfer
    from sp_gan_tpu.ops.pairwise import knn_indices

    with open(args.config) as f:
        cfg = Config.from_json(f.read())
    # torch reference is f32; compare compute in f32 with XLA kNN (the
    # pallas kernels are TPU-only and this check runs on CPU)
    cfg = cfg.replace(dtype="float32", use_pallas=False)

    with open(args.ckpt, "rb") as f:
        blob = pickle.load(f)
    st = blob["state"]
    g_params, g_stats = st["g_params"], st["g_stats"]
    d_params, d_stats = st["d_params"], st["d_stats"]

    RefG, RefD = load_reference_modules()
    import Generation.Generator as ref_gen_mod
    result = {"ckpt": args.ckpt, "epoch": blob["epoch"], "np": cfg.np,
              "n": args.n, "strict_load": True}

    # same inputs on both sides
    x = np.broadcast_to(sphere_template(cfg.np, cfg.template)[None],
                        (args.n, cfg.np, 3)).astype(np.float32).copy()
    z = np.asarray(sample_z(jax.random.PRNGKey(123), args.n, cfg.np, cfg.nz,
                            cfg.nv, cfg.n_rand), np.float32)

    # ---- torch side: genuine modules, exported weights, strict load ----
    sd = export_generator(jax.tree.map(np.asarray, g_params),
                          jax.tree.map(np.asarray, g_stats), cfg)
    tg = RefG(make_opts(cfg))
    tg.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(a).copy())
                        for k, a in sd.items()}, strict=True)
    tg.eval()

    def ref_forward():
        with torch.no_grad():
            return tg(torch.tensor(x),
                      torch.tensor(z)).numpy().transpose(0, 2, 1)

    # ---- our side: production path ----
    G = Generator(cfg)
    ours = np.asarray(G.apply({"params": g_params, "batch_stats": g_stats},
                              jnp.array(x), jnp.array(z), train=False))

    def gap(a, b):
        d1, d2 = chamfer(jnp.array(a), jnp.array(b))
        return {"max_abs_diff": float(np.abs(a - b).max()),
                "mean_abs_diff": float(np.abs(a - b).mean()),
                "pair_cd_max": float(np.asarray(d1 + d2).max())}

    # (1) unpinned: independent neighbor selection on each side
    ref_unpinned = ref_forward()
    result["g_unpinned"] = gap(ours, ref_unpinned)
    print(f"[parity] G unpinned: {result['g_unpinned']}", flush=True)

    # (2) pinned: delegate SELECTION to our knn_indices, keep every
    # reference op/weight — Generator.py:77 resolves get_edge_features
    # from its module globals, so rebinding there pins both EdgeBlocks
    orig_gef = ref_gen_mod.get_edge_features

    def pinned_gef(t, k, num=-1, idx=None, return_idx=False):
        if idx is None:
            feats = jnp.asarray(t.detach().numpy().transpose(0, 2, 1))
            our_idx = np.asarray(knn_indices(feats, k))      # [B, N, k]
            B, N, _ = our_idx.shape
            idx = torch.from_numpy(
                our_idx.reshape(B, N * k).astype(np.int64))
        return orig_gef(t, k, num=num, idx=idx, return_idx=return_idx)

    ref_gen_mod.get_edge_features = pinned_gef
    try:
        ref_pinned = ref_forward()
    finally:
        ref_gen_mod.get_edge_features = orig_gef
    result["g_pinned"] = gap(ours, ref_pinned)
    print(f"[parity] G pinned:   {result['g_pinned']}", flush=True)

    # (3) tie control: unmodified reference vs itself under an equally
    # valid tie order (stable argsort, self dropped like modules.py:703)
    def stable_gef(t, k, num=-1, idx=None, return_idx=False):
        if idx is None:
            xt = t.permute(0, 2, 1)
            dist = (-2 * torch.bmm(xt, t)
                    + torch.sum(xt ** 2, dim=2, keepdim=True)
                    + torch.sum(xt ** 2, dim=2, keepdim=True).permute(0, 2, 1))
            order = torch.argsort(dist, dim=2, stable=True)
            sel = order[:, :, 1:k + 1]
            B, N, _ = sel.shape
            idx = sel.contiguous().view(B, N * k)
        return orig_gef(t, k, num=num, idx=idx, return_idx=return_idx)

    ref_gen_mod.get_edge_features = stable_gef
    try:
        ref_stable = ref_forward()
    finally:
        ref_gen_mod.get_edge_features = orig_gef
    result["ref_tie_control"] = gap(ref_unpinned, ref_stable)
    print(f"[parity] ref vs ref (tie order only): "
          f"{result['ref_tie_control']}", flush=True)

    # ---- discriminator (no kNN): must match to float noise ----
    sd_d = export_discriminator(jax.tree.map(np.asarray, d_params),
                                jax.tree.map(np.asarray, d_stats), cfg)
    td = RefD(make_opts(cfg), num_point=cfg.np)
    td.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(a).copy())
                        for k, a in sd_d.items()}, strict=True)
    td.eval()
    with torch.no_grad():
        ref_scores = td(torch.tensor(
            ref_unpinned.transpose(0, 2, 1).copy())).numpy()
    D = Discriminator(cfg)
    our_scores = np.asarray(D.apply(
        {"params": d_params, "batch_stats": d_stats},
        jnp.array(ref_unpinned), train=False))
    result["d"] = {"max_abs_diff": float(np.abs(our_scores - ref_scores).max()),
                   "score_range": [float(ref_scores.min()),
                                   float(ref_scores.max())]}
    print(f"[parity] D: max|diff|={result['d']['max_abs_diff']:.2e}",
          flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[parity] wrote {args.out}", flush=True)

    # pinned compute parity is metric-level (mean / pair-CD): our_idx is
    # computed from torch's activations in the wrapper but from jax's in our
    # own forward, so isolated near-ties at the compute-noise floor can
    # still flip one edge for a handful of points (measured: mean 6.5e-7,
    # pair-CD 1.2e-8, max 3e-3 at 2 of 16384 points)
    ok = (result["g_pinned"]["mean_abs_diff"] < 1e-5
          and result["g_pinned"]["pair_cd_max"] < 1e-7
          and result["d"]["max_abs_diff"] < 1e-5
          # unpinned gap explained by the reference's own tie ambiguity
          and result["g_unpinned"]["pair_cd_max"]
          < 10 * max(result["ref_tie_control"]["pair_cd_max"], 1e-6))
    print(f"[parity] {'OK' if ok else 'FAIL'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
