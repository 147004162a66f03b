"""Fused kNN selection kernel.

For each query tile of TQ points, the kernel computes squared distances to all
N points of the same cloud — one [TQ, C] x [C, N] MXU matmul plus VPU
row/col-norm adds — entirely in VMEM, then extracts the k nearest by k rounds
of (min, argmin, mask). The [B, N, N] distance matrix never touches HBM
(the XLA path writes it out and reads it back: ~2 x 16MB per cloud at N=2048).

Self-exclusion matches `ops.pairwise.knn_indices`: the diagonal is masked to
+inf, neighbors come out in ascending-distance order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(x_ref, idx_ref, dist_ref, *, k: int, tq: int, n: int):
    q = pl.program_id(1)
    queries = x_ref[0, pl.ds(q * tq, tq), :]                # [TQ, C]
    keys = x_ref[0]                                         # [N, C]

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [TQ, 1]
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)        # [N, 1]
    cross = jax.lax.dot_general(
        queries, keys,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 MXU rounding flips near-ties
    )                                                        # [TQ, N]
    dist = qn - 2.0 * cross + kn.T

    # mask self
    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    dist = jnp.where(row_ids == col_ids, jnp.inf, dist)

    # k rounds of (min, argmin, mask). A packed dist|index single-reduce
    # variant was tried (bitcast-monotonic trick) but flips ~0.1% of
    # neighbors on near-ties in feature space — exactness wins; step time
    # was unchanged either way.
    def body(j, d):
        m = jnp.min(d, axis=1)                               # [TQ]
        a = jnp.argmin(d, axis=1).astype(jnp.int32)          # [TQ]
        idx_ref[0, :, j] = a
        dist_ref[0, :, j] = m
        return jnp.where(col_ids == a[:, None], jnp.inf, d)

    lax.fori_loop(0, k, body, dist, unroll=True)


def _knn_edge_kernel(x_ref, ee_ref, idx_ref, *, k: int, tq: int, n: int,
                     c: int, cd):
    """kNN selection + neighbor gather + edge-feature construction in one
    sweep: the per-round argmin's one-hot mask doubles as the gather matrix
    (one-hot @ keys on the MXU — entries exactly 1.0, so the gather is
    exact in any dtype). Kills the separate XLA gather, which ran at ~2%
    HBM bandwidth (~12 ms/step of the r1 default, trace-verified)."""
    q = pl.program_id(1)
    keys_raw = x_ref[0]                                     # [N, C] x.dtype
    queries_raw = x_ref[0, pl.ds(q * tq, tq), :]
    keys = keys_raw.astype(jnp.float32)
    queries = queries_raw.astype(jnp.float32)

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        queries, keys, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    dist = qn - 2.0 * cross + kn.T                          # [TQ, N]

    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    dist = jnp.where(row_ids == col_ids, jnp.inf, dist)

    keys_cd = keys_raw.astype(cd)
    central = queries_raw.astype(cd)
    # one-hot gathers are exact at HIGH (bf16_3x: out = 1.0*hi(v) +
    # 1.0*lo(v) = v); HIGHEST would double the pass count for nothing
    prec = (jax.lax.Precision.DEFAULT if cd == jnp.bfloat16
            else jax.lax.Precision.HIGH)
    for j in range(k):
        a = jnp.argmin(dist, axis=1).astype(jnp.int32)      # [TQ]
        oh = col_ids == a[:, None]                          # [TQ, N]
        nbr = jax.lax.dot_general(
            oh.astype(cd), keys_cd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(cd)                      # [TQ, C]
        idx_ref[0, :, j] = a
        ee_ref[0, :, j, :] = jnp.concatenate(
            [central, nbr - central], axis=-1)
        dist = jnp.where(oh, jnp.inf, dist)


@functools.partial(jax.jit, static_argnames=("k", "tq", "out_dtype"))
def knn_edge_pallas(x: jax.Array, k: int, out_dtype=None, tq: int = 256):
    """x: [B, N, C] -> (ee [B, N, k, 2C] in out_dtype (default x.dtype),
    idx [B, N, k] int32). Fused kNN (self-excluded, ascending) + edge
    features [central, nbr - central] — see `_knn_edge_kernel`.

    The distance selection always runs in f32 regardless of out_dtype, so a
    bf16 edge tensor (mixed_edge) keeps f32-exact neighbor choice."""
    B, N, C = x.shape
    cd = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    if N > 8192:
        tq = 8
    while N % tq:
        tq //= 2
    grid = (B, N // tq)
    kernel = functools.partial(_knn_edge_kernel, k=k, tq=tq, n=N, c=C, cd=cd)
    ee, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, tq, k, 2 * C), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k, 2 * C), cd),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C * (1 + k // 4), transcendentals=0,
            bytes_accessed=B * N * C * 4 * (N // tq)
            + B * N * k * (2 * C * cd.itemsize + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x)
    return ee, idx


@functools.partial(jax.jit, static_argnames=("k", "tq"))
def knn_pallas(x: jax.Array, k: int, tq: int = 256):
    """x: [B, N, C] -> (idx [B, N, k] int32, dist [B, N, k]).

    N must be a multiple of tq (pad upstream if not; the framework's point
    counts 256..20000 templates satisfy this for tq in {128, 256}).

    Indices and distances are exact; ties break toward the lower index
    (same as argmin).
    """
    # distances always in f32: bf16 inputs both lose selection accuracy and
    # can't drive an fp32-precision MXU contraction in Mosaic
    x = x.astype(jnp.float32)
    B, N, C = x.shape
    # VMEM ceiling: Mosaic's scoped-vmem accounting for the unrolled k-round
    # selection is nonlinear (tq=256 compiles up to N=8192; N=20000 OOMs even
    # at tq=32), so pin to measured-good tile sizes rather than a model.
    if N > 8192:
        tq = 8
    if N % tq != 0:
        cand = tq
        while cand >= 1 and N % cand:
            cand //= 2
        tq = max(cand, 1)
    grid = (B, N // tq)

    kernel = functools.partial(_knn_kernel, k=k, tq=tq, n=N)
    idx, dist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C, transcendentals=0,
            bytes_accessed=B * N * C * 4 * (N // tq) + B * N * k * 8),
    )(x)
    return idx, dist
