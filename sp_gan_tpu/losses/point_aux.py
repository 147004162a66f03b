"""Auxiliary point-set regularizers — rebuild of the upsampling-era losses in
`/root/reference/Common/model_utils.py:141-331` (`get_repulsion_loss`,
`get_uniform_loss`; carried over from the authors' PU-GAN lineage, listed in
SURVEY.md §2.2).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sp_gan_tpu.ops.pairwise import knn_indices, pairwise_sqdist


def repulsion_loss(pc: jax.Array, k: int = 5, h: float = 0.03) -> jax.Array:
    """Penalize points closer than `h` to their k nearest neighbors
    (model_utils `get_repulsion_loss` form: mean of (h - d)+ weighted)."""
    _, d2 = knn_indices(pc, k, return_dists=True)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    return jnp.mean(jax.nn.relu(h - d) ** 2)


def uniform_loss(pc: jax.Array, percentages=(0.4, 0.6, 0.8, 1.0, 1.2),
                 radius: float = 1.0, n_seed: int = 32,
                 nsample: int = 32) -> jax.Array:
    """Multi-scale uniformity of the PU-GAN lineage the reference's
    model_utils carries (`get_repulsion_loss4`'s weighted uniform term,
    `Common/model_utils.py:189-206`, and the knn-variance variant at
    `:314-322`): both occupancy AND intra-ball spacing terms.

    For FPS seed balls at radius r(p) = radius*sqrt(p/100):
      * occupancy deviation: E[(count - p*N/100)^2 / expect] — balls should
        hold their share of points;
      * spacing deviation: inside each ball, every member's nearest-neighbor
        distance is compared against the hex-packing expectation
        d_hat = sqrt(2*pi*r^2 / (sqrt(3)*expect)): E[(d - d_hat)^2 / d_hat].
    """
    B, N, _ = pc.shape
    from sp_gan_tpu.ops.sampling import (
        ball_query,
        farthest_point_sample,
        gather_points,
    )
    from sp_gan_tpu.ops.grouping import group_points

    seeds = gather_points(pc, farthest_point_sample(pc, n_seed))  # [B,S,3]
    d_seed = pairwise_sqdist(seeds, pc)                           # [B,S,N]
    loss = 0.0
    for p in percentages:
        r = radius * math.sqrt(p / 100.0)
        expect = max(p / 100.0 * N, 1.0)
        counts = (d_seed < r * r).sum(axis=-1)                    # [B,S]
        loss_occ = jnp.mean((counts - expect) ** 2 / expect)

        # intra-ball spacing: NN distance among the (up to nsample) members
        idx = ball_query(r, nsample, pc, seeds)                   # [B,S,k]
        members = group_points(pc, idx)                           # [B,S,k,3]
        dd = jnp.sum((members[..., :, None, :]
                      - members[..., None, :, :]) ** 2, axis=-1)  # [B,S,k,k]
        k = nsample
        valid = (jnp.arange(k)[None, None, :]
                 < jnp.minimum(counts, k)[..., None])             # [B,S,k]
        pair_ok = valid[..., :, None] & valid[..., None, :] \
            & ~jnp.eye(k, dtype=bool)
        nn_d = jnp.sqrt(jnp.min(jnp.where(pair_ok, dd, jnp.inf), axis=-1))
        member_ok = valid & (counts[..., None] >= 2)
        d_hat = math.sqrt(2.0 * math.pi * r * r / (math.sqrt(3.0) * expect))
        dev = jnp.where(member_ok, (nn_d - d_hat) ** 2 / d_hat, 0.0)
        loss_spacing = dev.sum() / jnp.maximum(member_ok.sum(), 1)
        loss = loss + loss_occ + loss_spacing
    return loss / len(percentages)


def uniform_loss_knn(pc: jax.Array, k: int = 6) -> jax.Array:
    """`get_uniform_loss_knn` (`Common/model_utils.py:314-322`): variance of
    kNN distances — var over points of each point's mean neighbor distance,
    plus the summed per-point variance of its neighbor distances. The
    reference's knn includes self (a zero first column); reproduced by
    prepending a zero column to our self-excluded distances."""
    _, d2 = knn_indices(pc, k - 1, return_dists=True)      # [B,N,k-1]
    d2 = jnp.concatenate([jnp.zeros_like(d2[..., :1]), d2], axis=-1)
    mean_k = d2.mean(axis=2)                               # [B,N]
    variance1 = jnp.sum(jnp.var(mean_k, axis=1))
    variance2 = jnp.sum(jnp.var(d2, axis=2))
    return variance1 + variance2
