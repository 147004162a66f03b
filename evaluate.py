#!/usr/bin/env python
"""CLI: run the reference evaluation protocol (JSD, COV-CD, MMD-CD, 1NN-CD,
optional EMD variants and FPD) between generated samples and a reference set.

    python evaluate.py --gen samples.npy --ref data/test_chair.npy
    python evaluate.py --log_dir log/run --n 200 --ref data/test_chair.npy --emd
    python evaluate.py --log_dir log/run --ckpt log/run/ckpt_epoch_1050.pkl \
        --ema --ref held_out.npy
"""

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen", default=None, help=".npy of generated clouds")
    p.add_argument("--log_dir", default=None, help="generate from checkpoint")
    p.add_argument("--ckpt", default=None,
                   help="specific checkpoint file (default: newest in "
                        "--log_dir)")
    p.add_argument("--ema", action="store_true",
                   help="generate with the EMA generator weights from the "
                        "checkpoint instead of the raw ones")
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--ref", required=True, help=".npy/.h5 of reference clouds")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--emd", action="store_true", help="include EMD metrics")
    p.add_argument("--emd_iters", type=int, default=10000,
                   help="auction iterations (reference test regime: 10000 "
                        "at eps=0.002; LOWER VALUES UNDERESTIMATE EMD — "
                        "see BASELINE.md convergence table)")
    p.add_argument("--fpd", action="store_true", help="include FPD (random-"
                   "feature unless --fpd_stats trained stats are given)")
    p.add_argument("--fpd_stats", default=None)
    p.add_argument("--jsd_scale", type=float, default=0.5,
                   help="scale clouds by this before the JSD voxel "
                        "histogram (the histogram covers [-0.5,0.5]; 0.5 "
                        "keeps normalized clouds in-cube and matches the "
                        "in-loop eval.jsonl convention; 1.0 reproduces the "
                        "reference's raw out-of-cube behavior)")
    p.add_argument("--mesh_points", type=int, default=0,
                   help="shard each EMD solve's quadratic distance tile "
                        "over this many devices (points mesh) — lifts the "
                        "single-chip memory ceiling for large-N protocols")
    p.add_argument("--fpd_weights", default=None,
                   help="reference-protocol DGCNN classifier weights "
                        "(Classify_dgcnn_cls_k40_1024_b32.pkl) for "
                        "checkpoint-comparable FPD")
    args = p.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from sp_gan_tpu.eval import compute_all_metrics, FPD

    if args.gen:
        gen = np.load(args.gen)
    else:
        assert args.log_dir, "need --gen or --log_dir"
        import os
        from sp_gan_tpu.config import Config
        from sp_gan_tpu.manipulate import from_checkpoint
        from sp_gan_tpu.train.checkpoint import latest_checkpoint
        with open(os.path.join(args.log_dir, "config.json")) as f:
            cfg = Config.from_json(f.read())
        ckpt = args.ckpt or latest_checkpoint(args.log_dir)
        man = from_checkpoint(ckpt, cfg, use_ema=args.ema)
        gen = man.generate(args.n)

    if args.ref.endswith(".h5"):
        import h5py
        with h5py.File(args.ref, "r") as f:
            key = next(iter(f.keys()))
            ref = f[key][:]
    else:
        ref = np.load(args.ref)

    mesh = None
    if args.mesh_points:
        from sp_gan_tpu.parallel import make_mesh
        mesh = make_mesh((args.mesh_points,), ("points",))

    n = min(len(gen), len(ref))
    metrics = compute_all_metrics(gen[:n], ref[:n], normalize=args.normalize,
                                  use_emd=args.emd, emd_iters=args.emd_iters,
                                  mesh=mesh, jsd_scale=args.jsd_scale)
    if args.fpd:
        blob = None
        if args.fpd_weights:
            # flax variables pickle ({params, batch_stats} — e.g. the
            # synthetic-family extractor from scripts/train_fpd_dgcnn.py)
            # vs the reference protocol's torch state_dict (both are .pkl;
            # dispatch on content)
            import pickle
            try:
                with open(args.fpd_weights, "rb") as f:
                    cand = pickle.load(f)
                if isinstance(cand, dict) and "params" in cand:
                    blob = cand
            except Exception:
                pass
        if blob is not None:
            # honor the hyperparams stored with the extractor (pickles
            # written by scripts/train_fpd_dgcnn.py carry k/feat_dims; a
            # mismatched kNN graph gives wrong-but-plausible FPD)
            fpd = FPD(variables={k: blob[k]
                                 for k in ("params", "batch_stats")
                                 if k in blob},
                      k=int(blob.get("k", 40)),
                      feat_dims=int(blob.get("feat_dims", 1024)))
            metrics["FPD_note"] = ("locally-trained DGCNN extractor — not "
                                   "comparable to the reference's ShapeNet "
                                   "FPD")
        elif args.fpd_weights:
            fpd = FPD.from_torch(args.fpd_weights)
        else:
            fpd = FPD()
        metrics["FPD"] = fpd(gen[:n], ref[:n] if not args.fpd_stats else None,
                             stats_path=args.fpd_stats)
        if fpd.random_features:
            metrics["FPD_note"] = "random-feature DGCNN (no trained weights)"
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
