"""Shape-preserving loss — rebuild of `get_local_pair` /
`compute_mean_covariance` (`/root/reference/Common/loss_utils.py:196-257`,
the PDGN shape-preserving term): Chamfer distance between the local
neighborhood means and covariances of two clouds, with both clouds'
neighborhoods grouped at the *first* cloud's query positions (reference
queries both groups at `new_xyz = pt1`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sp_gan_tpu.ops import knn_query, group_points
from sp_gan_tpu.ops.chamfer import chamfer_sums


def local_mean_covariance(groups: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """groups [B, M, K, 3] -> (mu [B,M,3], cov [B,M,3,3])."""
    mu = groups.mean(axis=2, keepdims=True)
    centered = groups - mu
    cov = jnp.einsum("bmkc,bmkd->bmcd", centered, centered) / groups.shape[2]
    return mu[:, :, 0], cov


def shape_preserving_loss(pt1: jax.Array, pt2: jax.Array,
                          k: int = 20) -> Tuple[jax.Array, jax.Array]:
    """pt1 [B,M,3], pt2 [B,N,3] -> (like_mu, like_var) scalars.

    Both neighborhood sets are grouped around pt1's points, then summed
    Chamfer between the stacked means / flattened covariances, normalized by
    M (matching the reference's `chamfer_loss(...) / pt1_M`).
    """
    B, M, _ = pt1.shape
    idx1, _ = knn_query(k, pt1, pt1)
    idx2, _ = knn_query(k, pt2, pt1)
    g1 = group_points(pt1, idx1)                   # [B,M,k,3]
    g2 = group_points(pt2, idx2)
    mu1, var1 = local_mean_covariance(g1)
    mu2, var2 = local_mean_covariance(g2)
    like_mu = chamfer_sums(mu1, mu2) / M
    like_var = chamfer_sums(var1.reshape(B, M, 9),
                            var2.reshape(B, M, 9)) / M
    return like_mu, like_var
