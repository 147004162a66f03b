"""Fused Chamfer-distance kernel with custom VJP.

Computes both directed NN-distance reductions (and their argmins) while
streaming query tiles through VMEM: per (batch, query-tile) grid step one
[TQ, M] distance block is produced on the MXU, reduced to row minima/argmins
(x->y direction) and folded into running column minima/argmins held in the
revisited output block. The [N, M] matrix never reaches HBM — the same tiling
idea as the reference CUDA kernel's 512-point shared-memory chunks
(`metrics/CD_EMD/cd/chamferdist/chamfer.cu`), expressed as a Pallas grid.

The backward matches the reference `NmDistanceGradKernel`: for each point the
gradient flows along the vector to its matched nearest neighbor, with the
scatter to the matched side expressed as a batched `.at[].add` (XLA scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chamfer_kernel(x_ref, y_ref, d1_ref, i1_ref, d2_ref, i2_ref, *, tq: int):
    q = pl.program_id(1)
    queries = x_ref[0, pl.ds(q * tq, tq), :]                # [TQ, C]
    keys = y_ref[0]                                         # [M, C]
    m = keys.shape[0]

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        queries, keys,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist = qn - 2.0 * cross + kn.T                          # [TQ, M]

    d1_ref[0, :, 0] = jnp.min(dist, axis=1)                 # x -> y minima
    i1_ref[0, :, 0] = jnp.argmin(dist, axis=1).astype(jnp.int32)

    col_min = jnp.min(dist, axis=0)                         # [M]
    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, m), 0)
    col_arg = jnp.argmin(dist, axis=0)                      # [M] tile-local
    col_arg = q * tq + col_arg.astype(jnp.int32)            # global row id

    @pl.when(q == 0)
    def _():
        d2_ref[0, :, 0] = col_min
        i2_ref[0, :, 0] = col_arg

    @pl.when(q != 0)
    def _():
        better = col_min < d2_ref[0, :, 0]
        d2_ref[0, :, 0] = jnp.where(better, col_min, d2_ref[0, :, 0])
        i2_ref[0, :, 0] = jnp.where(better, col_arg, i2_ref[0, :, 0])


@functools.partial(jax.jit, static_argnames=("tq",))
def _chamfer_pallas_raw(x: jax.Array, y: jax.Array, tq: int = 256):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    B, N, C = x.shape
    M = y.shape[1]
    if N % tq != 0:
        for cand in (128, 64, 32, 16, 8, 4, 2, 1):
            if N % cand == 0:
                tq = cand
                break
    grid = (B, N // tq)
    kernel = functools.partial(_chamfer_kernel, tq=tq)
    spec_q = lambda shape: pl.BlockSpec(shape, lambda b, q: (b, q, 0),
                                        memory_space=pltpu.VMEM)
    spec_full = lambda shape: pl.BlockSpec(shape, lambda b, q: (b, 0, 0),
                                           memory_space=pltpu.VMEM)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec_q((1, tq, 1)), spec_q((1, tq, 1)),
            spec_full((1, M, 1)), spec_full((1, M, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * M * C, transcendentals=0,
            bytes_accessed=(B * (N + M) * C * 4) * (N // tq)),
    )(x, y)
    return d1[..., 0], i1[..., 0], d2[..., 0], i2[..., 0]


@jax.custom_vjp
def chamfer_pallas(x: jax.Array, y: jax.Array):
    """x: [B,N,3], y: [B,M,3] -> (dist1 [B,N], dist2 [B,M]) squared NN dists."""
    d1, _, d2, _ = _chamfer_pallas_raw(x, y)
    return d1, d2


def _cp_fwd(x, y):
    d1, i1, d2, i2 = _chamfer_pallas_raw(x, y)
    return (d1, d2), (x, y, i1, i2)


def _cp_bwd(res, g):
    x, y, i1, i2 = res
    g1, g2 = g                                        # [B,N], [B,M]
    y1 = jnp.take_along_axis(y, i1[..., None], axis=1)     # [B,N,3]
    x2 = jnp.take_along_axis(x, i2[..., None], axis=1)     # [B,M,3]
    v1 = 2.0 * g1[..., None] * (x - y1)
    v2 = 2.0 * g2[..., None] * (y - x2)
    dx = v1
    dy = v2
    # scatter the matched-side contributions
    def scatter_add(dest, idx, vals):
        return dest.at[idx].add(-vals)
    dy = jax.vmap(scatter_add)(dy, i1, v1)
    dx = jax.vmap(scatter_add)(dx, i2, v2)
    return dx, dy


chamfer_pallas.defvjp(_cp_fwd, _cp_bwd)
