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
                 radius: float = 1.0) -> jax.Array:
    """Multi-scale uniformity (model_utils `get_uniform_loss`): for random
    seed balls of expected occupancy p*N, compare actual occupancy and local
    spacing against the uniform expectation."""
    B, N, _ = pc.shape
    loss = 0.0
    d_all = pairwise_sqdist(pc, pc)
    for p in percentages:
        r = radius * math.sqrt(p / 100.0)
        expect = max(p / 100.0 * N, 1.0)
        inside = (d_all < r * r).astype(jnp.float32)
        counts = inside.sum(axis=-1)                       # [B,N] per seed
        # occupancy deviation term
        loss = loss + jnp.mean((counts - expect) ** 2 / expect)
    return loss / len(percentages)
