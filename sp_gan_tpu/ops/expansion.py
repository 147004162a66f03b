"""Expansion penalty (MSN) — TPU-native replacement for
`/root/reference/metrics/expansion_penalty/expansion_penalty_cuda.cu`.

Per primitive (a contiguous run of `primitive_size` points), build the
euclidean minimum spanning tree with Prim's algorithm, then penalize edges
longer than `alpha * mean_edge_length`. Returns per-point penalty distances,
the penalized neighbor index (or -1), and the per-cloud mean MST edge length —
the same contract as `expansion_penalty_module.py`.

Deviation noted: the CUDA kernel attributes each MST edge to an endpoint by
iterative leaf-stripping; we attribute each edge to the Prim *child* node.
Both schemes assign every edge to exactly one distinct endpoint, so the total
penalty and its minimizer are identical — only which of the two endpoints
carries the (one-sided) gradient can differ.

The backward matches the CUDA `calc_grad`: gradient `2*g*(x_u - x_v)` applied
to the penalized endpoint only.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _prim_mst(pts: jax.Array):
    """Prim MST over one primitive. pts [P,3] ->
    (parent [P] int32, edge_len [P] float; entry 0 is the root with len 0)."""
    P = pts.shape[0]

    def body(i, state):
        visited, cur_dis, cur_idx, parent, edge_len, last = state
        last_pt = pts[last]
        d = jnp.sqrt(jnp.sum((pts - last_pt[None, :]) ** 2, axis=-1))
        closer = (~visited) & (d < cur_dis)
        cur_dis = jnp.where(closer, d, cur_dis)
        cur_idx = jnp.where(closer, last, cur_idx)
        sel = jnp.argmin(jnp.where(visited, jnp.inf, cur_dis)).astype(jnp.int32)
        visited = visited.at[sel].set(True)
        parent = parent.at[sel].set(cur_idx[sel])
        edge_len = edge_len.at[sel].set(cur_dis[sel])
        return visited, cur_dis, cur_idx, parent, edge_len, sel

    init = (
        jnp.zeros((P,), bool).at[0].set(True),
        jnp.full((P,), jnp.inf, pts.dtype),
        jnp.zeros((P,), jnp.int32),
        jnp.full((P,), -1, jnp.int32),
        jnp.zeros((P,), pts.dtype),
        jnp.int32(0),
    )
    _, _, _, parent, edge_len, _ = lax.fori_loop(0, P - 1, body, init)
    return parent, edge_len


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def expansion_penalty(xyz: jax.Array, primitive_size: int,
                      alpha: float = 1.5) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """xyz [B, N, 3] with N % primitive_size == 0.

    Returns (dist [B,N], assignment [B,N] int32, mean_mst_length [B])."""
    return _expansion_forward(xyz, primitive_size, alpha)


def _expansion_forward(xyz, primitive_size, alpha):
    B, N, _ = xyz.shape
    P = primitive_size
    assert N % P == 0, f"N={N} must be a multiple of primitive_size={P}"
    nprim = N // P
    prims = xyz.reshape(B * nprim, P, 3)
    parent, edge_len = jax.vmap(_prim_mst)(prims)        # [B*nprim, P]
    mean_len = jnp.sum(edge_len, axis=-1) / (P - 1)      # [B*nprim]
    penalized = edge_len > alpha * mean_len[:, None]
    dist = jnp.where(penalized, edge_len, 0.0)
    # neighbor index, offset into the full cloud (primitive-local parent +
    # primitive offset), -1 where unpenalized — matching the CUDA layout.
    prim_offset = (jnp.arange(B * nprim, dtype=jnp.int32) % nprim) * P
    assign = jnp.where(penalized, parent + prim_offset[:, None], -1)
    dist = dist.reshape(B, N)
    assign = assign.reshape(B, N).astype(jnp.int32)
    mean_mst_length = mean_len.reshape(B, nprim).mean(axis=-1)
    return dist, assign, mean_mst_length


def _exp_fwd(xyz, primitive_size, alpha):
    out = _expansion_forward(xyz, primitive_size, alpha)
    return out, (xyz, out[1])


def _exp_bwd(primitive_size, alpha, res, g):
    xyz, assign = res
    g_dist = g[0]
    safe_idx = jnp.maximum(assign, 0)
    nbr = jnp.take_along_axis(xyz, safe_idx[..., None], axis=1)
    mask = (assign >= 0)[..., None]
    grad = jnp.where(mask, 2.0 * g_dist[..., None] * (xyz - nbr), 0.0)
    return (grad,)


expansion_penalty.defvjp(_exp_fwd, _exp_bwd)


def expansion_loss(xyz: jax.Array, primitive_size: int, alpha: float = 1.5) -> jax.Array:
    """Scalar mean penalty (the usual training reduction)."""
    dist, _, _ = expansion_penalty(xyz, primitive_size, alpha)
    return jnp.mean(dist)
