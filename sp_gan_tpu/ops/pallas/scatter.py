"""MXU-driven scatter-add: dx[b, idx[b,s], :] += g[b, s, :].

The transpose of the kNN neighbor gather. TPU's native scatter serializes on
the clustered duplicate targets a kNN graph produces, and the XLA one-hot
einsum alternative lowers to a non-MXU loop fusion (both measured ~8-12ms at
B=24 N=2048 k=10 on v5e). Here each (target-tile, source-tile) pair becomes a
[T, S] x [S, F] matmul of an on-the-fly one-hot membership mask against the
gradient block — all flops on the MXU, the one-hot never leaves VMEM, and
accumulation happens in the revisited f32 output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, g_ref, out_ref, *, t_tile: int, s_tile: int):
    t = pl.program_id(1)
    s = pl.program_id(2)
    idx_s = idx_ref[0, :, 0]                                # [S] int32
    g_s = g_ref[0]                                          # [S, F]
    S = idx_s.shape[0]

    cols = t * t_tile + jax.lax.broadcasted_iota(
        jnp.int32, (S, t_tile), 1)                          # [S, T]
    oh = (idx_s[:, None] == cols).astype(g_s.dtype)         # [S, T]
    contrib = jax.lax.dot_general(
        oh, g_s,
        dimension_numbers=(((0,), (0,)), ((), ())),          # contract S
        preferred_element_type=jnp.float32,
    )                                                        # [T, F]

    @pl.when(s == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(s != 0)
    def _():
        out_ref[0] += contrib


@functools.partial(jax.jit, static_argnames=("n_targets", "t_tile", "s_tile"))
def scatter_add_pallas(g: jax.Array, idx: jax.Array, n_targets: int,
                       t_tile: int = 256, s_tile: int = 2048) -> jax.Array:
    """g: [B, S, F], idx: [B, S] int32 -> out [B, n_targets, F] float32."""
    B, S, F = g.shape
    while n_targets % t_tile:
        t_tile //= 2
    while S % s_tile:
        s_tile //= 2
    grid = (B, n_targets // t_tile, S // s_tile)
    kernel = functools.partial(_scatter_kernel, t_tile=t_tile, s_tile=s_tile)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_tile, 1), lambda b, t, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, F), lambda b, t, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, F), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_targets, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * n_targets * F, transcendentals=0,
            bytes_accessed=B * S * (F + 1) * 4 * (n_targets // t_tile)
            + B * n_targets * F * 4),
    )(idx[..., None].astype(jnp.int32), g)
    return out
