#!/usr/bin/env python
"""Dress rehearsal of the full reference-checkpoint protocol (VERDICT r1 #4):

  torch reference-format G .pth  ->  convert_reference_checkpoint.py
  ->  generate clouds  ->  MMD-CD / COV / 1NN / JSD (+EMD opt)
  ->  FPD with converted (replica) DGCNN weights

The .pth comes from the reference-shaped torch replica used by
tests/test_torch_parity.py (random init — this validates the *pipeline*
end-to-end, including torch-output agreement at N=2048; quality-grade
numbers need a reference-trained checkpoint, not present in this image).

Usage: python scripts/dress_rehearsal.py [--n 64] [--use-emd]
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--np", type=int, default=2048)
    ap.add_argument("--use-emd", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import numpy as np
    import torch
    from test_torch_parity import TGenerator
    from test_fpd_compat import TorchDGCNNEncoder

    out = args.out or tempfile.mkdtemp(prefix="dress_")
    os.makedirs(out, exist_ok=True)
    print("workdir:", out, flush=True)

    # ---- 1. reference-format .pth from the torch replica ----
    torch.manual_seed(0)
    tg = TGenerator(nz=128, k=10)
    pth = os.path.join(out, "000_Chair_G.pth")
    torch.save({"G_model": tg.state_dict(), "G_epoch": 0}, pth)
    print("wrote replica checkpoint:", pth, flush=True)

    # ---- 2. convert ----
    imported = os.path.join(out, "imported")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "convert_reference_checkpoint.py"),
                    "--g", pth, "--out", imported, "--np", str(args.np)],
                   check=True)

    # ---- 3. torch-vs-jax output agreement at full dims ----
    import jax
    import jax.numpy as jnp
    from sp_gan_tpu.config import Config
    from sp_gan_tpu.manipulate import from_checkpoint
    from sp_gan_tpu.train.checkpoint import latest_checkpoint

    with open(os.path.join(imported, "config.json")) as f:
        cfg = Config.from_json(f.read()).replace(dtype="float32")
    man = from_checkpoint(latest_checkpoint(imported), cfg)

    rng = np.random.default_rng(0)
    z0 = np.tile(0.2 * rng.standard_normal((2, 1, cfg.nz)),
                 (1, args.np, 1)).astype(np.float32)
    ours = man.forward(jnp.asarray(z0))
    with torch.no_grad():
        theirs = tg(torch.from_numpy(
            np.asarray(man.sphere)[None].repeat(2, 0)),
            torch.from_numpy(z0)).transpose(2, 1).numpy()
    dev = np.abs(ours - theirs)
    print(f"torch-output agreement at N={args.np}: max |diff| = "
          f"{dev.max():.2e}, median = {np.median(dev):.2e}", flush=True)
    print("  (at N=2048 the fibonacci template has kNN distance near-ties "
          "~1e-4; ~0.1% of rows order two equal-distance neighbors "
          "differently across torch/XLA f32 rounding, and the per-slot "
          "conv_out weights + global max-pool smear that into a small "
          "whole-cloud offset — neighbor SETS agree 100%. Metric-level "
          "parity, below, is the meaningful fidelity measure.)", flush=True)
    # cross-implementation metric parity: ours-vs-theirs as gen/ref sets
    from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
    cd = np.asarray(pairwise_cd_matrix(jnp.asarray(ours),
                                       jnp.asarray(theirs)))
    print(f"  cross-impl CD(ours_i, theirs_i): "
          f"{np.diag(cd).mean():.2e} (same-z clouds)", flush=True)

    # ---- 4. generate + metric protocol ----
    gen = man.generate(args.n, seed=1, normalize=True)
    from sp_gan_tpu.data import SyntheticDataset
    from sp_gan_tpu.data.augment import normalize_point_cloud
    ref = np.asarray(normalize_point_cloud(
        SyntheticDataset(n_items=args.n, n_points=args.np).data))

    from sp_gan_tpu.eval.metrics import compute_all_metrics
    metrics = compute_all_metrics(jnp.asarray(gen), jnp.asarray(ref),
                                  use_emd=args.use_emd)
    for k, v in metrics.items():
        print(f"  {k}: {float(v):.6f}", flush=True)

    # ---- 5. FPD with converted DGCNN weights ----
    from sp_gan_tpu.compat import convert_dgcnn
    from sp_gan_tpu.eval.fpd import FPD
    torch.manual_seed(1)
    enc = TorchDGCNNEncoder(k=20, feat_dims=256)
    enc.train()
    with torch.no_grad():
        for _ in range(2):
            enc(torch.randn(4, 256, 3))
    enc.eval()
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    fpd = FPD(convert_dgcnn(sd), k=20, feat_dims=256, batch_size=16)
    val = fpd(gen, ref)
    print(f"  fpd (replica-weights): {val:.4f}", flush=True)
    print("dress rehearsal complete", flush=True)


if __name__ == "__main__":
    main()
