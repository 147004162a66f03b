"""Pairwise squared distances and k-nearest-neighbor selection.

Replaces the reference's `pairwise_dist`/`knn`/distance block of
`get_edge_features` (`/root/reference/Generation/modules.py:629-706`), which
builds a dense [B,N,N] matrix with `bmm` + `torch.sort`. Here the matrix is a
single batched matmul (MXU) and selection is `lax.top_k`; for large N use the
Pallas streaming kernel in `sp_gan_tpu.ops.pallas.knn` which never materializes
the [N,N] matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_sqdist(
    x: jax.Array, y: jax.Array, precision=lax.Precision.HIGHEST
) -> jax.Array:
    """Squared euclidean distances between two point sets.

    Args:
      x: [..., N, C]
      y: [..., M, C]
    Returns:
      [..., N, M] with d[n, m] = ||x_n - y_m||^2 (up to fp rounding; computed
      via the expanded form, matching the reference's formula exactly).

    The cross-term matmul runs at HIGHEST precision by default: distances feed
    top-k neighbor *selection*, where bf16 MXU rounding can flip near-ties.
    """
    # xx + yy - 2 x.y — one big matmul for the cross term keeps this on the MXU.
    xx = jnp.sum(x * x, axis=-1, keepdims=True)            # [..., N, 1]
    yy = jnp.sum(y * y, axis=-1, keepdims=True)            # [..., M, 1]
    xy = jnp.matmul(x, jnp.swapaxes(y, -1, -2), precision=precision)
    return xx - 2.0 * xy + jnp.swapaxes(yy, -1, -2)


def knn_indices(
    x: jax.Array,
    k: int,
    *,
    exclude_self: bool = True,
    return_dists: bool = False,
):
    """Indices of the k nearest neighbors of each point within its own cloud.

    Matches the reference semantics (`modules.py:694-703`): full pairwise
    distance then take the k closest *excluding the point itself*. The
    reference achieves self-exclusion by sorting and dropping column 0 (self
    has distance 0); we mask the diagonal to +inf, which is equivalent except
    for exactly-duplicate points.

    Args:
      x: [B, N, C] points (or features).
      k: neighbor count (static).
    Returns:
      idx [B, N, k] int32 (and squared distances [B, N, k] if requested).
    """
    d = pairwise_sqdist(x, x)
    if exclude_self:
        n = d.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        d = jnp.where(eye, jnp.inf, d)
    # top_k of negated distance = k smallest distances.
    neg_d, idx = lax.top_k(-d, k)
    if return_dists:
        return idx.astype(jnp.int32), -neg_d
    return idx.astype(jnp.int32)
