"""Point-axis sharding — the point-cloud analog of sequence/context
parallelism (SURVEY.md §5 "long-context"): shard the N points of each cloud
across a `points` mesh axis so the O(N^2) graph ops scale past one chip's
memory for high-resolution clouds (BASELINE.json configs[4], 8192+ points).

The reference has no equivalent (it scales N only via template files and the
O(n)-memory EMD). Here each shard computes kNN/edge features for its local
query slice against the all-gathered key set: the all-gather of [B, N, C]
rides ICI once per layer, while the [N_local, N] distance work and the
[B, N_local, k, 2C] activations stay shard-local — an N_shards-fold memory
reduction on the quadratic and edge tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


def knn_pointsharded(x: jax.Array, k: int, mesh: Mesh,
                     axis: str = "points") -> jax.Array:
    """Self-kNN over a point-sharded cloud.

    x: [B, N, C] sharded along N over `axis`. Returns idx [B, N, k] (global
    indices, same sharding), self excluded.
    """

    def local(x_local):
        nshards = lax.axis_size(axis)
        shard = lax.axis_index(axis)
        n_local = x_local.shape[1]
        x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)  # [B,N,C]
        d = pairwise_sqdist(x_local, x_full)          # [B, n_local, N]
        rows = shard * n_local + jnp.arange(n_local)
        cols = jnp.arange(x_full.shape[1])
        self_mask = rows[:, None] == cols[None, :]
        d = jnp.where(self_mask[None], jnp.inf, d)
        _, idx = lax.top_k(-d, k)
        return idx.astype(jnp.int32)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)


def edge_features_pointsharded(x: jax.Array, k: int, mesh: Mesh,
                               axis: str = "points") -> jax.Array:
    """Edge features [B, N, k, 2C] with N sharded: local queries vs gathered
    keys; the quadratic distance block and the edge tensor are shard-local."""

    def local(x_local):
        nshards = lax.axis_size(axis)
        shard = lax.axis_index(axis)
        B, n_local, C = x_local.shape
        x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)
        d = pairwise_sqdist(x_local, x_full)
        rows = shard * n_local + jnp.arange(n_local)
        cols = jnp.arange(x_full.shape[1])
        d = jnp.where((rows[:, None] == cols[None, :])[None], jnp.inf, d)
        _, idx = lax.top_k(-d, k)                       # [B, n_local, k]
        flat = idx.reshape(B, n_local * k)
        nbrs = jnp.take_along_axis(x_full, flat[..., None], axis=1)
        nbrs = nbrs.reshape(B, n_local, k, C)
        central = jnp.broadcast_to(x_local[:, :, None, :], nbrs.shape)
        return jnp.concatenate([central, nbrs - central], axis=-1)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None, None),
    )(x)


def edge_diff_local(x_local: jax.Array, k: int,
                    axis: str = "points") -> jax.Array:
    """Shard-local diff-only edge features for use INSIDE an enclosing
    `shard_map` (the point-sharded train step): local queries against the
    all-gathered key set, returning `nbr - central` [B, n_local, k, C] with
    global self-exclusion. The all-gather of [B, N, C] rides ICI once; the
    [B, n_local, N] distance block and the edge tensor stay shard-local.

    kNN selection is piecewise-constant, so the index computation runs under
    stop_gradient and the gather's autodiff handles d_nbr scattering (through
    the all_gather's psum-scatter VJP — neighbor gradients flow back to the
    owning shard, exactly the semantics of the unsharded op)."""
    B, n_local, C = x_local.shape
    x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)    # [B, N, C]
    shard = lax.axis_index(axis)
    xq = lax.stop_gradient(x_local)
    xk = lax.stop_gradient(x_full)
    d = pairwise_sqdist(xq.astype(jnp.float32), xk.astype(jnp.float32))
    rows = shard * n_local + jnp.arange(n_local)
    cols = jnp.arange(x_full.shape[1])
    d = jnp.where((rows[:, None] == cols[None, :])[None], jnp.inf, d)
    _, idx = lax.top_k(-d, k)                                     # [B,nl,k]
    idx = lax.stop_gradient(idx)
    flat = idx.reshape(B, n_local * k)
    nbrs = jnp.take_along_axis(x_full, flat[..., None], axis=1)
    nbrs = nbrs.reshape(B, n_local, k, C)
    return nbrs - x_local[:, :, None, :]


def global_max_points(x_local: jax.Array, axis: str = "points") -> jax.Array:
    """Differentiable max over the sharded point axis: local max, all_gather
    the per-shard maxima, max again. [B, n_local, C] -> [B, C] replicated.
    (The gather keeps the reduction differentiable — gradients route to the
    arg-max owner shard through the gather's VJP; `lax.pmax` has no VJP.)"""
    g_local = jnp.max(x_local, axis=1)                            # [B, C]
    gathered = lax.all_gather(g_local, axis)                      # [P, B, C]
    return jnp.max(gathered, axis=0)


def chamfer_pointsharded(x: jax.Array, y: jax.Array, mesh: Mesh,
                         axis: str = "points") -> Tuple[jax.Array, jax.Array]:
    """Directed Chamfer minima with both clouds point-sharded: each shard
    reduces its local x block against the gathered y, and the y-side minima
    are combined with a psum-of-min trick (min = -pmax(-x))."""

    def local(x_local, y_local):
        y_full = lax.all_gather(y_local, axis, axis=1, tiled=True)
        d = pairwise_sqdist(x_local, y_full)            # [B, nx_local, M]
        d1_local = jnp.min(d, axis=-1)                  # [B, nx_local]
        # y-side minima over all x shards: combine via global min
        d2_partial = jnp.min(d, axis=-2)                # [B, M]
        d2_full = -lax.pmax(-d2_partial, axis)          # [B, M] replicated
        n_local = y_local.shape[1]
        shard = lax.axis_index(axis)
        d2_local = lax.dynamic_slice_in_dim(d2_full, shard * n_local,
                                            n_local, axis=1)
        return d1_local, d2_local

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
    )(x, y)
