"""Point sampling and interpolation ops — TPU-native replacements for the
`pointnet2`/`pointnet2_ops` CUDA extensions
(`/root/reference/metrics/pointnet2_ops/src/sampling_gpu.cu`,
`ball_query_gpu.cu`, `interpolate_gpu.cu`) and the MDS extension
(`/root/reference/metrics/MDS/MDS_cuda.cu`).

All ops are pure functions with static output shapes; iterative selections
(FPS, MDS) are `lax.fori_loop`s over a running state so the whole op is one
compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest-point sampling. xyz [B,N,3] -> idx [B,npoint] int32.

    Matches `furthest_point_sampling_kernel` (sampling_gpu.cu): starts from
    index 0, each step takes the point with max distance to the selected set.
    """
    B, N, _ = xyz.shape

    def body(i, state):
        min_d, idxs, last = state                     # [B,N], [B,npoint], [B]
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)   # [B,N]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return min_d, idxs, nxt

    init = (
        jnp.full((B, N), jnp.inf, xyz.dtype),
        jnp.zeros((B, npoint), jnp.int32),
        jnp.zeros((B,), jnp.int32),                   # first pick = index 0
    )
    _, idxs, _ = lax.fori_loop(1, npoint, body, init)
    return idxs


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [B,N,C], idx [B,M] -> [B,M,C]. (CUDA `gather_points_kernel`;
    the backward scatter-add falls out of autodiff.)"""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """For each query point, indices of up to `nsample` points within `radius`.

    Matches `ball_query_gpu.cu`: slots beyond the found count are padded with
    the first in-radius index. xyz [B,N,3], new_xyz [B,S,3] -> [B,S,nsample].
    """
    d = pairwise_sqdist(new_xyz, xyz)                         # [B,S,N]
    N = xyz.shape[1]
    inside = d < radius * radius
    order = jnp.where(inside, jnp.arange(N, dtype=jnp.int32)[None, None, :], N)
    picked = -lax.top_k(-order, nsample)[0]                   # nsample smallest
    first = picked[..., :1]                                   # first hit (or N)
    picked = jnp.where(picked >= N, first, picked)
    # Queries with zero in-radius points fall back to index 0 (CUDA leaves the
    # zero-initialized buffer there).
    return jnp.where(picked >= N, 0, picked).astype(jnp.int32)


def three_nn(unknown: jax.Array, known: jax.Array):
    """3 nearest neighbors of each `unknown` point among `known` points.

    Returns (dist [B,N,3] squared, idx [B,N,3]) like `interpolate_gpu.cu`'s
    `three_nn_kernel` (which reports squared distances).
    """
    d = pairwise_sqdist(unknown, known)
    neg_d, idx = lax.top_k(-d, 3)
    return -neg_d, idx.astype(jnp.int32)


def three_interpolate(points: jax.Array, idx: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted 3-NN feature interpolation.

    points [B,M,C], idx [B,N,3], weight [B,N,3] -> [B,N,C].
    """
    B, N, _ = idx.shape
    gathered = jnp.take_along_axis(
        points, idx.reshape(B, N * 3)[..., None], axis=1
    ).reshape(B, N, 3, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights used with `three_interpolate` (pointnet2
    convention: 1/d normalized over the 3 neighbors)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("npoint",))
def minimum_density_sample(xyz: jax.Array, npoint: int,
                           mean_mst_length: jax.Array | None = None) -> jax.Array:
    """Minimum-density sampling (MSN) — `MDS_cuda.cu` equivalent.

    Each step picks the point with minimum accumulated Gaussian density wrt the
    already-selected set, with kernel bandwidth proportional to
    `mean_mst_length` (per-batch scalar, defaults to 1).
    xyz [B,N,3] -> idx [B,npoint].
    """
    B, N, _ = xyz.shape
    if mean_mst_length is None:
        mean_mst_length = jnp.ones((B,), xyz.dtype)
    sigma = mean_mst_length[:, None]                     # [B,1]
    brange = jnp.arange(B)

    def body(i, state):
        density, selected, idxs, last = state
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d2 = jnp.sum((xyz - last_xyz) ** 2, axis=-1)
        density = density + jnp.exp(-d2 / (sigma ** 2))
        nxt = jnp.argmin(jnp.where(selected, jnp.inf, density), axis=-1)
        nxt = nxt.astype(jnp.int32)
        selected = selected.at[brange, nxt].set(True)
        idxs = idxs.at[:, i].set(nxt)
        return density, selected, idxs, nxt

    selected0 = jnp.zeros((B, N), bool).at[:, 0].set(True)
    init = (
        jnp.zeros((B, N), xyz.dtype),
        selected0,
        jnp.zeros((B, npoint), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    _, _, idxs, _ = lax.fori_loop(1, npoint, body, init)
    return idxs
