"""Chamfer distance — TPU-native replacement for the CUDA extension at
`/root/reference/metrics/CD_EMD/cd/chamferdist/chamfer.cu` (shared-memory tiled
NN search with a hand-written backward).

On TPU the forward is a batched matmul + row/col min, which XLA maps onto the
MXU directly, and the backward falls out of autodiff (min-reduction subgradient
scatters to the argmin — identical semantics to the reference's hand-written
`NmDistanceGradKernel`). No custom VJP needed. A memory-tiled variant
(`chamfer_tiled`) streams over chunks of the first cloud for large N so the
[N, M] matrix never exceeds a chunk.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


def nn_distance(x: jax.Array, y: jax.Array):
    """Bidirectional nearest-neighbor distances (the CUDA ext's interface).

    Args:
      x: [B, N, 3], y: [B, M, 3]
    Returns:
      (dist1 [B,N], idx1 [B,N], dist2 [B,M], idx2 [B,M]): squared distance and
      index of each point's nearest neighbor in the other cloud — same
      contract as `chamfer_cuda.cpp` forward.
    """
    d = pairwise_sqdist(x, y)                # [B, N, M]
    dist1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist2 = jnp.min(d, axis=-2)
    idx2 = jnp.argmin(d, axis=-2).astype(jnp.int32)
    return dist1, idx1, dist2, idx2


def chamfer(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean squared NN distance in both directions: ([B], [B])."""
    d = pairwise_sqdist(x, y)
    return jnp.min(d, axis=-1).mean(axis=-1), jnp.min(d, axis=-2).mean(axis=-1)


def chamfer_sums(x: jax.Array, y: jax.Array) -> jax.Array:
    """Summed bidirectional Chamfer, scalar per batch summed over batch.

    Matches reference `ChamferLoss.forward` (`Common/loss_utils.py:94-107`):
    sum over points and batch of both direction minima.
    """
    d = pairwise_sqdist(x, y)
    return jnp.sum(jnp.min(d, axis=-2)) + jnp.sum(jnp.min(d, axis=-1))


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_tiled(x: jax.Array, y: jax.Array, chunk: int = 512):
    """Memory-tiled Chamfer for large point counts.

    Streams chunks of `x` rows against all of `y` with `lax.scan` (the
    flash-attention-style decomposition of the reference CUDA kernel's
    512-point shared-memory tiles). Peak memory O(B * chunk * M) instead of
    O(B * N * M). Requires N % chunk == 0 (pad upstream).
    """
    B, N, C = x.shape
    M = y.shape[1]
    assert N % chunk == 0, f"N={N} must be divisible by chunk={chunk}"
    xs = x.reshape(B, N // chunk, chunk, C).transpose(1, 0, 2, 3)  # [S, B, chunk, C]

    def step(carry, xc):
        mins2 = carry                                   # [B, M] running min for y-side
        d = pairwise_sqdist(xc, y)                      # [B, chunk, M]
        d1 = jnp.min(d, axis=-1)                        # [B, chunk]
        mins2 = jnp.minimum(mins2, jnp.min(d, axis=-2))
        return mins2, d1

    init = jnp.full((B, M), jnp.inf, x.dtype)
    mins2, d1s = lax.scan(step, init, xs)
    dist1 = d1s.transpose(1, 0, 2).reshape(B, N)
    return dist1.mean(axis=-1), mins2.mean(axis=-1)
