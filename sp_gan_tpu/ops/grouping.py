"""kNN query and feature grouping — TPU-native replacement for the `pointops`
CUDA extension (`/root/reference/metrics/pointops/src/knnquery/
knnquery_cuda_kernel.cu`, `grouping/`, and the Python wrappers
`pointops/functions/pointops.py` — `KNNQuery`, `Grouping`, `QueryAndGroup`,
`Gen_QueryAndGroupXYZ`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


def knn_query(k: int, xyz: jax.Array, new_xyz: Optional[jax.Array] = None):
    """k nearest `xyz` points for each `new_xyz` query (self *included*,
    unlike the generator's edge kNN — pointops `knnquery` returns the query
    point itself first when querying its own cloud).

    xyz [B,N,3], new_xyz [B,S,3] -> (idx [B,S,k] int32, dist2 [B,S,k]).
    """
    if new_xyz is None:
        new_xyz = xyz
    d = pairwise_sqdist(new_xyz, xyz)
    neg_d, idx = lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg_d


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [B,N,C], idx [B,S,k] -> [B,S,k,C] (CUDA `grouping_forward`)."""
    B, S, k = idx.shape
    flat = idx.reshape(B, S * k)
    return jnp.take_along_axis(points, flat[..., None], axis=1).reshape(B, S, k, -1)


def query_and_group(
    xyz: jax.Array,
    features: Optional[jax.Array],
    k: int,
    new_xyz: Optional[jax.Array] = None,
    use_xyz: bool = True,
) -> jax.Array:
    """pointops `QueryAndGroup` (kNN flavor): group neighbor features with
    recentered relative coordinates, optionally concatenating them.

    Returns [B, S, k, 3+C] (or [B,S,k,C] when use_xyz=False).
    """
    if new_xyz is None:
        new_xyz = xyz
    idx, _ = knn_query(k, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is None:
        return grouped_xyz
    grouped_feats = group_points(features, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    return grouped_feats


def query_and_group_xyz(xyz: jax.Array, k: int) -> jax.Array:
    """pointops `Gen_QueryAndGroupXYZ` (used by `get_local_pair`,
    `/root/reference/Common/loss_utils.py:208-257`): neighbor xyz groups
    without recentering. [B,N,3] -> [B,N,k,3]."""
    idx, _ = knn_query(k, xyz, xyz)
    return group_points(xyz, idx)


def feature_distribute(max_xyz: jax.Array, xyz: jax.Array) -> jax.Array:
    """pointops `featuredistribute` (`metrics/pointops/src/
    featuredistribute/`): for each point of `xyz`, the index of its nearest
    point in `max_xyz`. [B,M,3],[B,N,3] -> [B,N] int32."""
    d = pairwise_sqdist(xyz, max_xyz)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def feature_gather(max_feature: jax.Array, distribute_idx: jax.Array) -> jax.Array:
    """pointops `featuregather`: max_feature [B,M,C], idx [B,N] -> [B,N,C]."""
    return jnp.take_along_axis(max_feature, distribute_idx[..., None], axis=1)


def label_stat(labels: jax.Array, idx: jax.Array, n_classes: int) -> jax.Array:
    """pointops `labelstat_idx`-style neighborhood label histogram: labels
    [B,N] int, neighbor idx [B,S,k] -> [B,S,n_classes] counts."""
    grouped = group_points(labels[..., None].astype(jnp.int32), idx)[..., 0]
    onehot = jax.nn.one_hot(grouped, n_classes, dtype=jnp.int32)
    return jnp.sum(onehot, axis=2)


def label_stat_ball_range(labels: jax.Array, xyz: jax.Array,
                          new_xyz: jax.Array, radius: float,
                          n_classes: int) -> jax.Array:
    """pointops `labelstat_ballrange`: per query, label histogram over *all*
    points within `radius` (not capped at nsample)."""
    d = pairwise_sqdist(new_xyz, xyz)                      # [B,S,N]
    inside = d < radius * radius
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.int32)  # [B,N,Cl]
    return jnp.einsum("bsn,bnc->bsc", inside.astype(jnp.int32), onehot)
