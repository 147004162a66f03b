"""Fused train-mode EdgeBlock (forward) — batch-stats edition of
`ops/pallas/edgeblock.py`.

Train-mode BatchNorm needs batch statistics of three chained conv outputs.
Materializing those [B, N, k, F] tensors is what makes the XLA lowering
HBM-bound; here the statistics come from:

  * BN1 / BNx (conv directly on the edge tensor): exact *sufficient
    statistics* — for h = e @ W + b, per-channel mean/var follow from the
    first and second moments of e:  E[h] = E[e] @ W + b and
    E[h h] = diag(W^T E[e e^T] W) (+ cross terms with b). E[e], E[e e^T]
    are one cheap [2C, 2C] contraction of the edge tensor — no [B,N,k,F]
    materialization.
  * BN2 (conv of a *nonlinear* function of BN1's output): one Pallas pass
    that recomputes h1 -> y1 -> h2 per tile in VMEM and accumulates
    per-channel sum / sum-of-squares into a revisited scalar block.

With all three (mean, var) known, the forward output is exactly the eval
kernel (`edge_tail_pallas`) with batch-stat affines. Total edge-tensor reads:
2 (moments + stats2) + 1 (output) vs ~6 materialized round-trips in XLA.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.ops.pallas.edgeblock import edge_tail_pallas


def _affine(mean, var, gamma, beta, conv_bias, eps=1e-5):
    """Fold conv bias + train-mode BN(mean,var) into scale/shift rows [2,F].

    BN input is h = xW + b; kernels compute xW and apply
    (xW + b - mean) * inv * gamma + beta = xW * a + c.
    """
    inv = gamma * jax.lax.rsqrt(var + eps)
    return jnp.stack([inv, (conv_bias - mean) * inv + beta]).astype(jnp.float32)


def _moment_stats(ee: jax.Array, kernel: jax.Array, bias: jax.Array,
                  cols: slice) -> Tuple[jax.Array, jax.Array]:
    """Exact batch mean/var of (ee[..., cols] @ kernel + bias) per channel
    via first/second moments of the edge tensor slice."""
    e = ee[..., cols].astype(jnp.float32)
    B, N, k, C = e.shape
    M = B * N * k
    flat = e.reshape(M, C)
    mu_e = jnp.mean(flat, axis=0)                          # [C]
    second = (flat.T @ flat) / M                           # [C, C]
    mean_h = mu_e @ kernel + bias                          # [F]
    # E[(xW)_f^2] = W_f^T E[xx^T] W_f ; var = E[h^2] - E[h]^2 with h = xW + b
    e_xw2 = jnp.einsum("cf,cd,df->f", kernel, second, kernel)
    mean_xw = mu_e @ kernel
    var_h = e_xw2 + 2 * bias * mean_xw + bias ** 2 - mean_h ** 2
    return mean_h, jnp.maximum(var_h, 0.0)


def _stats2_kernel(ee_ref, w1_ref, a1_ref, w2_ref, out_ref, *, tq, k, c, f):
    """Accumulate sum / sum-of-squares of h2 = lrelu(bn1(h1)) @ W2 (+0) into
    out [1, 2, F] (revisited across the whole grid). The +b2 shift is added
    analytically outside."""
    t = pl.program_id(0) * 0 + pl.program_id(1)  # grid (B, N/tq)
    ee = ee_ref[0]
    diff = ee.reshape(tq * k, 2 * c)[:, c:]

    h1 = jax.lax.dot_general(diff, w1_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y1 = h1 * a1_ref[0] + a1_ref[1]
    y1 = jnp.where(y1 >= 0, y1, 0.01 * y1)
    h2 = jax.lax.dot_general(y1, w2_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = jnp.sum(h2, axis=0)
    s2 = jnp.sum(h2 * h2, axis=0)
    both = jnp.stack([s, s2])                              # [2, F]

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[0] = both

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0] += both


@functools.partial(jax.jit, static_argnames=("k", "tq"))
def _stats2_pallas(ee, w1, a1, w2, k: int, tq: int = 256):
    B, N, kk, C2 = ee.shape
    C = C2 // 2
    F = w2.shape[1]
    while N % tq:
        tq //= 2
    kern = functools.partial(_stats2_kernel, tq=tq, k=k, c=C, f=F)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, N // tq),
        in_specs=[
            pl.BlockSpec((1, tq, kk, C2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(a1), full(w2),
        ],
        out_specs=pl.BlockSpec((1, 2, F), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2, F), jnp.float32),
    )(ee, w1, a1, w2)
    return out[0]


def edge_block_train_stats(params: Dict, ee: jax.Array, k: int,
                           eps: float = 1e-5):
    """Compute train-mode batch statistics for all three BNs.

    Returns dict {bn_w1: (mean, var), bn_w2: ..., bn_x: ...}."""
    B, N, kk, C2 = ee.shape
    C = C2 // 2
    M = B * N * kk
    w1 = params["conv_w1"]["kernel"].astype(jnp.float32)
    b1 = params["conv_w1"]["bias"].astype(jnp.float32)
    w2 = params["conv_w2"]["kernel"].astype(jnp.float32)
    b2 = params["conv_w2"]["bias"].astype(jnp.float32)
    wx = params["conv_x"]["kernel"].astype(jnp.float32)
    bx = params["conv_x"]["bias"].astype(jnp.float32)

    m1, v1 = _moment_stats(ee, w1, b1, slice(C, 2 * C))
    mx, vx = _moment_stats(ee, wx, bx, slice(0, 2 * C))

    a1 = _affine(m1, v1, params["bn_w1"]["scale"].astype(jnp.float32),
                 params["bn_w1"]["bias"].astype(jnp.float32), b1, eps)
    sums = _stats2_pallas(ee.astype(jnp.float32), w1, a1, w2, k)
    mean2 = sums[0] / M + b2                # h2 = y1@W2 + b2
    var2 = sums[1] / M - (sums[0] / M) ** 2
    return {"bn_w1": (m1, v1), "bn_w2": (mean2, jnp.maximum(var2, 0.0)),
            "bn_x": (mx, vx)}


def edge_block_train_forward(params: Dict, ee: jax.Array, k: int,
                             neg: float = 0.01, eps: float = 1e-5):
    """Fused train-mode forward. Returns (out [B,N,F], stats dict)."""
    stats = edge_block_train_stats(params, ee, k, eps)
    g = lambda bn: (params[bn]["scale"].astype(jnp.float32),
                    params[bn]["bias"].astype(jnp.float32))
    a1 = _affine(*stats["bn_w1"], *g("bn_w1"),
                 params["conv_w1"]["bias"].astype(jnp.float32), eps)
    a2 = _affine(*stats["bn_w2"], *g("bn_w2"),
                 params["conv_w2"]["bias"].astype(jnp.float32), eps)
    ax = _affine(*stats["bn_x"], *g("bn_x"),
                 params["conv_x"]["bias"].astype(jnp.float32), eps)
    out = edge_tail_pallas(
        ee.astype(jnp.float32),
        params["conv_w1"]["kernel"].astype(jnp.float32), a1,
        params["conv_w2"]["kernel"].astype(jnp.float32), a2,
        params["conv_x"]["kernel"].astype(jnp.float32), ax,
        params["out_kernel"].astype(jnp.float32),
        params["out_bias"][None].astype(jnp.float32),
        k=k, neg=neg)
    return out, stats
