"""PointNet++ set-abstraction / feature-propagation and PointTransformer
layers.

TPU rebuilds of the reference's auxiliary point-network stack:
  * `PointNetSetAbstraction(Msg)` / `PointNetFeaturePropagation`
    (`/root/reference/Common/pointnet_util.py:63-321`, and the CUDA-backed
    twins `metrics/pointnet2_ops/pointnet2_modules.py:10-140`),
  * density-weighted PointConv (`Common/pointconv_util.py:199-384`),
  * `PointTransformerLayer` (`Generation/modules.py:1602-1646`).

All grouping runs through `sp_gan_tpu.ops` (FPS / ball-query / kNN — Pallas
or XLA by dispatch); the per-group MLPs are Dense layers on [B, S, k, C]
blocks (batched MXU matmuls).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sp_gan_tpu.ops import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    knn_query,
    three_interpolate,
    three_nn,
)
from sp_gan_tpu.ops.sampling import interpolation_weights


class SetAbstraction(nn.Module):
    """Sample (FPS) -> group (ball query) -> per-group MLP -> max pool.

    [B,N,3] xyz (+ [B,N,C] features) -> ([B,S,3], [B,S,mlp[-1]]).
    group_all=True mirrors the reference's GroupAll (single global group).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = True):
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = xyz[:, None]                         # [B,1,N,3]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, features[:, None]], axis=-1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, fps_idx)          # [B,S,3]
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None]
            if features is not None:
                grouped_feat = group_points(features, idx)
                grouped = jnp.concatenate([grouped_xyz, grouped_feat], -1) \
                    if self.use_xyz else grouped_feat
            else:
                grouped = grouped_xyz

        h = grouped
        for i, w in enumerate(self.mlp):
            h = nn.Dense(w, name=f"mlp{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(h)
            h = nn.relu(h)
        return new_xyz, jnp.max(h, axis=2)                  # pool over group


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping variant (`PointNetSetAbstractionMsg`,
    pointnet_util.py:138-187): one ball query + MLP per radius, concat."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = True):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)
        outs = []
        for s, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples,
                                             self.mlps)):
            idx = ball_query(r, ns, xyz, new_xyz)
            grouped = group_points(xyz, idx) - new_xyz[:, :, None]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, group_points(features, idx)], axis=-1)
            h = grouped
            for i, w in enumerate(mlp):
                h = nn.Dense(w, name=f"scale{s}_mlp{i + 1}")(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"scale{s}_bn{i + 1}")(h)
                h = nn.relu(h)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN interpolation + unit MLP
    (`PointNetFeaturePropagation`, pointnet_util.py:234-321)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, feat1, feat2, train: bool = True):
        """xyz1 [B,N,3] dense points; xyz2 [B,S,3] sparse points with feat2;
        feat1 is skip-connected features at xyz1 (or None)."""
        if xyz2.shape[1] == 1:
            interp = jnp.broadcast_to(
                feat2, (feat2.shape[0], xyz1.shape[1], feat2.shape[-1]))
        else:
            dist, idx = three_nn(xyz1, xyz2)
            w = interpolation_weights(dist)
            interp = three_interpolate(feat2, idx, w)
        h = interp if feat1 is None else jnp.concatenate([feat1, interp], -1)
        for i, width in enumerate(self.mlp):
            h = nn.Dense(width, name=f"mlp{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(h)
            h = nn.relu(h)
        return h


class PointConv(nn.Module):
    """Density-weighted PointConv set abstraction
    (`Common/pointconv_util.py:199-384`): grouped features weighted by an
    MLP of local point density, then a learned weight-net contraction."""

    npoint: int
    nsample: int
    mlp: Sequence[int]
    bandwidth: float = 0.1

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = True):
        B, N, _ = xyz.shape
        # gaussian KDE density (pointconv_util.compute_density)
        from sp_gan_tpu.ops.pairwise import pairwise_sqdist
        sq = pairwise_sqdist(xyz, xyz)
        gauss = jnp.exp(-sq / (2.0 * self.bandwidth ** 2)) \
            / (2.5 * self.bandwidth)
        density = gauss.mean(axis=-1)                       # [B,N]
        inv_density = 1.0 / (density + 1e-8)

        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)
        idx, _ = knn_query(self.nsample, xyz, new_xyz)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None]
        grouped = grouped_xyz if features is None else jnp.concatenate(
            [grouped_xyz, group_points(features, idx)], axis=-1)

        grouped_density = group_points(inv_density[..., None], idx)  # [B,S,k,1]
        scale = grouped_density / jnp.max(grouped_density, axis=2,
                                          keepdims=True)
        density_scale = nn.Dense(1, name="density_net")(scale)
        density_scale = nn.sigmoid(density_scale)

        h = grouped
        for i, w in enumerate(self.mlp):
            h = nn.Dense(w, name=f"mlp{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(h)
            h = nn.relu(h)
        h = h * density_scale

        # weight-net over local coordinates, contracted against features
        w = nn.relu(nn.Dense(16, name="weight_net1")(grouped_xyz))
        w = nn.relu(nn.Dense(16, name="weight_net2")(w))
        out = jnp.einsum("bskc,bskw->bscw", h, w).reshape(
            B, self.npoint, -1)
        out = nn.Dense(self.mlp[-1], name="linear")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn_out")(out)
        return new_xyz, nn.relu(out)


class PointTransformerLayer(nn.Module):
    """Vector self-attention over kNN groups with relative-position encoding
    (`Generation/modules.py:1602-1646`)."""

    dim: int
    pos_hidden: int = 64
    attn_hidden_mult: int = 4
    k: int = 16

    @nn.compact
    def __call__(self, x, pos):
        """x [B,N,C], pos [B,N,3] -> [B,N,C]."""
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(x)
        kk = nn.Dense(self.dim, use_bias=False, name="to_k")(x)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(x)

        idx, _ = knn_query(self.k, pos, pos)
        rel_pos = pos[:, :, None] - group_points(pos, idx)   # [B,N,k,3]
        pos_emb = nn.Dense(self.pos_hidden, name="pos1")(rel_pos)
        pos_emb = nn.relu(pos_emb)
        pos_emb = nn.Dense(self.dim, name="pos2")(pos_emb)   # [B,N,k,C]

        k_n = group_points(kk, idx)                          # [B,N,k,C]
        v_n = group_points(v, idx) + pos_emb

        a = q[:, :, None] - k_n + pos_emb                    # [B,N,k,C]
        a = nn.Dense(self.dim * self.attn_hidden_mult, name="attn1")(a)
        a = nn.relu(a)
        a = nn.Dense(self.dim, name="attn2")(a)
        a = jax.nn.softmax(a, axis=2)
        return jnp.sum(a * v_n, axis=2)
