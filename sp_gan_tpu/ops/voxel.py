"""Voxel occupancy histograms for the JSD metric.

Replaces `get_voxel_occ_dist` (`/root/reference/Common/loss_utils.py:474-516`),
which bins points into a res^3 grid over [-bound, bound] with a numpy loop.
Here it is one scatter-add (`segment_sum`) over flattened voxel ids, jittable
and batched on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("res",))
def voxel_occupancy(clouds: jax.Array, res: int = 28, bound: float = 0.5) -> jax.Array:
    """Count, per voxel, the number of points falling inside it.

    Args:
      clouds: [S, N, 3] point clouds.
    Returns:
      [res**3] float64-free counts (float32); a point contributes iff all of
      its coordinates lie within [-bound, bound) — same inclusion rule as the
      reference's boundary test.
    """
    x = clouds.reshape(-1, 3)
    ids = jnp.floor((x + bound) * (res / (2 * bound))).astype(jnp.int32)
    inside = jnp.all((x >= -bound) & (x < bound), axis=-1)
    ids = jnp.clip(ids, 0, res - 1)
    flat = ids[:, 0] * res * res + ids[:, 1] * res + ids[:, 2]
    flat = jnp.where(inside, flat, res ** 3)  # dump outside points in a bin we drop
    counts = jax.ops.segment_sum(
        inside.astype(jnp.float32), flat, num_segments=res ** 3 + 1
    )
    return counts[: res ** 3]


def occupancy_distribution(clouds, res: int = 28, bound: float = 0.5):
    """Normalized voxel occupancy distribution (sums to 1)."""
    counts = voxel_occupancy(clouds, res=res, bound=bound)
    total = jnp.maximum(jnp.sum(counts), 1.0)
    return counts / total
