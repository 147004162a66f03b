#!/usr/bin/env python
"""Train the FPD feature extractor on the synthetic multi-class family.

The reference's FPD protocol depends on an EXTERNAL ShapeNet-trained DGCNN
classifier (`Classify_dgcnn_cls_k40_1024_b32.pkl`,
/root/reference/Common/GAN_metrics.py:125-188) that is absent from this
environment, so FPD has only ever run here with random features. This
trains the same extractor architecture (`eval/dgcnn.py::DGCNNFeat` + a
linear class head) to classify the three synthetic families — giving the
image TRAINED, discriminative evaluator weights for campaign FPD. The
resulting numbers are a synthetic-family FPD, NOT comparable to the
reference's ShapeNet FPD; every consumer labels them as such.

    python scripts/train_fpd_dgcnn.py --out runs/fpd_dgcnn_synth.pkl \
        --stats_out runs/fpd_stats_synth.npz

Prints one JSON line per eval with train/val accuracy, then writes the
extractor variables (pickle of flax {params, batch_stats}) and the
held-out reference statistics npz.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/fpd_dgcnn_synth.pkl")
    p.add_argument("--stats_out", default="runs/fpd_stats_synth.npz")
    p.add_argument("--np", type=int, default=2048)
    p.add_argument("--k", type=int, default=40)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n_train", type=int, default=1536)
    p.add_argument("--n_val", type=int, default=192)
    p.add_argument("--n_stats", type=int, default=384)
    args = p.parse_args()

    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from sp_gan_tpu.data import SyntheticMultiClassDataset
    from sp_gan_tpu.data.augment import normalize_point_cloud
    from sp_gan_tpu.eval.dgcnn import DGCNNFeat
    from sp_gan_tpu.eval.fpd import FPD

    n_cls = 3
    train = SyntheticMultiClassDataset(n_items=args.n_train,
                                       n_points=args.np, seed=10)
    val = SyntheticMultiClassDataset(n_items=args.n_val,
                                     n_points=args.np, seed=11)
    xtr = np.asarray(normalize_point_cloud(train.data), np.float32)
    xva = np.asarray(normalize_point_cloud(val.data), np.float32)
    ytr, yva = train.labels, val.labels

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            f = DGCNNFeat(k=args.k, name="feat")(x, train=train)
            return nn.Dense(n_cls, name="head")(f)

    model = Classifier()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, args.np, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, (mut["batch_stats"], logits)
        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, new_bs, opt_state, loss, acc

    @jax.jit
    def predict(params, batch_stats, x):
        return jnp.argmax(model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False),
            -1)

    rng_np = np.random.default_rng(0)
    t0 = time.time()
    for it in range(args.steps):
        sel = rng_np.integers(0, len(xtr), size=args.bs)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state,
            jnp.asarray(xtr[sel]), jnp.asarray(ytr[sel]))
        if (it + 1) % 200 == 0 or it == 0:
            preds = []
            for lo in range(0, len(xva), args.bs):
                preds.append(np.asarray(predict(
                    params, batch_stats, jnp.asarray(xva[lo:lo + args.bs]))))
            val_acc = float((np.concatenate(preds) == yva).mean())
            print(json.dumps({"step": it + 1, "loss": float(loss),
                              "train_acc": float(acc), "val_acc": val_acc,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)

    feat_vars = {"params": params["feat"],
                 "batch_stats": batch_stats["feat"],
                 # extractor hyperparams travel with the weights so loaders
                 # (evaluate.py, Trainer._inloop_fpd) rebuild the exact kNN
                 # graph/width instead of assuming defaults
                 "k": args.k, "feat_dims": 1024}
    with open(args.out, "wb") as f:
        pickle.dump(feat_vars, f)
    print(json.dumps({"saved": args.out}), flush=True)

    # reference statistics from a draw disjoint from the extractor's
    # training/val seeds (10/11) and every campaign's training seed (0);
    # seed=1 deliberately MATCHES the held-out metric-eval draw so FPD and
    # CD metrics score against the same reference distribution
    stats_ds = SyntheticMultiClassDataset(n_items=args.n_stats,
                                          n_points=args.np, seed=1)
    ref = np.asarray(normalize_point_cloud(stats_ds.data), np.float32)
    fpd = FPD(variables=feat_vars, k=args.k)
    fpd.save_statistics(ref, args.stats_out)
    # sanity: FPD of a same-distribution draw should be near 0, a
    # single-class draw clearly larger
    same = SyntheticMultiClassDataset(n_items=96, n_points=args.np, seed=2)
    one = SyntheticMultiClassDataset(n_items=96, n_points=args.np, seed=3,
                                     n_classes=1)
    f_same = fpd(np.asarray(normalize_point_cloud(same.data), np.float32),
                 stats_path=args.stats_out)
    f_one = fpd(np.asarray(normalize_point_cloud(one.data), np.float32),
                stats_path=args.stats_out)
    print(json.dumps({"stats": args.stats_out, "fpd_same_dist": f_same,
                      "fpd_single_class": f_one}), flush=True)


if __name__ == "__main__":
    main()
