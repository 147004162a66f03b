"""DGCNN classification feature extractor for FPD.

The reference's FPD pipeline (`/root/reference/Common/GAN_metrics.py:125-188`)
loads an external, non-vendored DGCNN classifier (`evaluation/AutoEncoder.py`,
weights `Classify_dgcnn_cls_k40_1024_b32.pkl`) and takes its penultimate
global feature as the FID-style activation. This is the standard DGCNN-cls
encoder (Wang et al. 2019): 4 EdgeConv stages (64, 64, 128, 256) on kNN graph
features, concat, 1x1 conv to `feat_dims`, global max(+avg) pooling.

We implement that encoder in JAX so FPD runs on TPU; pretrained torch weights
can be injected through `sp_gan_tpu.compat.torch_import.convert_dgcnn` when
the user has the external file (it is not redistributable with the reference
either — its README points at an external download).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sp_gan_tpu.ops import edge_features


class DGCNNFeat(nn.Module):
    """[B, N, 3] -> [B, feat_dims] global feature (max-pooled; `max_avg`
    doubles the width like the reference's `multi` option).

    Protocol notes for trained-weight parity (the extractor behind
    `Classify_dgcnn_cls_k40_1024_b32.pkl` is the DGCNN-cls encoder of
    antao97/UnsupervisedPointCloudReconstruction, loaded by
    `GAN_metrics.load_evaluate_model`): its kNN graph INCLUDES the point
    itself (torch `topk` over the full row), and its edge features are
    ordered (neighbor - central, central). We keep our (central, diff)
    layout — `compat.convert_dgcnn` swaps the first conv kernel's channel
    blocks — and default `include_self=True` to match the extractor."""

    k: int = 40
    feat_dims: int = 1024
    multi: Optional[str] = None   # None | "max" | "max_avg"
    include_self: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from sp_gan_tpu.ops.pairwise import knn_indices
        widths = (64, 64, 128, 256)
        feats = []
        h = x
        k = min(self.k, x.shape[1] - 1)   # clamp for tiny clouds
        for i, w in enumerate(widths):
            idx = knn_indices(h, k, exclude_self=not self.include_self)
            ee = edge_features(h, k, idx=idx)              # [B,N,k,2C]
            v = nn.Dense(w, name=f"conv{i + 1}")(ee)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(v)
            v = nn.leaky_relu(v, 0.2)
            h = jnp.max(v, axis=2)                         # max over neighbors
            feats.append(h)
        cat = jnp.concatenate(feats, axis=-1)              # [B,N,512]
        g = nn.Dense(self.feat_dims, name="conv5")(cat)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn5")(g)
        g = nn.leaky_relu(g, 0.2)
        gmax = jnp.max(g, axis=1)
        if self.multi == "max_avg":
            return jnp.concatenate([gmax, jnp.mean(g, axis=1)], axis=-1)
        return gmax
