"""Fused train-mode EdgeBlock — batch-stats edition of
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

Round-2 restructure (v2): every sweep walks a LARGE grid tile (tq points)
with an inner `fori_loop` over small chunks (cs points), so only
chunk-sized temporaries are ever live in VMEM. This cuts the sequential
Mosaic grid from 768 steps/pass (tq=64, the round-1 VMEM-forced tile) to
B * N/tq steps while keeping the working set ~5 MB. Kernels are also
dtype-aware: a bf16 edge tensor (the `mixed_edge` default) is consumed
directly — chunks are cast in VMEM and the chain matmuls run on the MXU in
bf16 with f32 accumulation, matching the XLA mixed_edge numerics; an f32
edge tensor keeps the exact-f32 path (used by the parity tests).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.ops.pallas.edgeblock import edge_tail_pallas

# the big-tile sweeps sit a little above the 16 MB default scoped-vmem
# limit once in/out blocks are double-buffered; v5e has headroom
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


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
    via first/second moments of the edge tensor slice (f32 accumulation)."""
    e = ee[..., cols]
    B, N, k, C = e.shape
    M = B * N * k
    flat = e.reshape(M, C)
    mu_e = jnp.mean(flat, axis=0, dtype=jnp.float32)       # [C]
    second = jax.lax.dot_general(
        flat, flat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / M            # [C, C]
    mean_h = mu_e @ kernel + bias                          # [F]
    # E[(xW)_f^2] = W_f^T E[xx^T] W_f ; var = E[h^2] - E[h]^2 with h = xW + b
    e_xw2 = jnp.einsum("cf,cd,df->f", kernel, second, kernel)
    mean_xw = mu_e @ kernel
    var_h = e_xw2 + 2 * bias * mean_xw + bias ** 2 - mean_h ** 2
    return mean_h, jnp.maximum(var_h, 0.0)


def _pick_tiles(N: int, tq: int, cs: int) -> Tuple[int, int]:
    while N % tq:
        tq //= 2
    cs = min(cs, tq)
    while tq % cs:
        cs //= 2
    return tq, cs


def _mm(x, w, cd):
    """Chain matmul in compute dtype `cd` (bf16 on the mixed path) with f32
    accumulation on the MXU. Precision is left to jax_default_matmul_precision
    so parity checks can force HIGHEST globally (TPU "default" f32 matmuls run
    reduced-precision bf16 passes) without slowing production paths. bf16
    operands pin DEFAULT — Mosaic rejects fp32 contract precision on bf16
    inputs ("Bad lhs type")."""
    prec = jax.lax.Precision.DEFAULT if cd == jnp.bfloat16 else None
    return jax.lax.dot_general(x.astype(cd), w.astype(cd),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _lrelu(v, neg=0.01):
    return jnp.where(v >= 0, v, neg * v)


def _dlrelu(v, neg=0.01):
    return jnp.where(v >= 0, 1.0, neg)


def _stats2_kernel(ee_ref, w1_ref, a1_ref, w2_ref, out_ref,
                   *, tq, cs, k, c, f, cd):
    """Accumulate sum / sum-of-squares of h2 = lrelu(bn1(h1)) @ W2 (+0) into
    out [1, 2, F] (revisited across the whole grid). The +b2 shift is added
    analytically outside."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    a1 = a1_ref[:, :]

    def body(ci, _):
        ee = ee_ref[0, pl.ds(ci * cs, cs)]                 # [cs, k, 2C]
        diff = ee.reshape(cs * k, 2 * c)[:, c:]
        h1 = _mm(diff, w1, cd)
        y1 = h1 * a1[0] + a1[1]
        y1 = jnp.where(y1 >= 0, y1, 0.01 * y1)
        h2 = _mm(y1, w2, cd)
        s = jnp.sum(h2, axis=0)
        s2 = jnp.sum(h2 * h2, axis=0)
        out_ref[0] += jnp.stack([s, s2])                   # [2, F]
        return 0

    jax.lax.fori_loop(0, tq // cs, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "cs"))
def _stats2_pallas(ee, w1, a1, w2, k: int, tq: int = 1024, cs: int = 512):
    B, N, kk, C2 = ee.shape
    C = C2 // 2
    F = w2.shape[1]
    tq, cs = _pick_tiles(N, tq, cs)
    cd = jnp.bfloat16 if ee.dtype == jnp.bfloat16 else jnp.float32
    kern = functools.partial(_stats2_kernel, tq=tq, cs=cs, k=k, c=C, f=F,
                             cd=cd)
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
        compiler_params=_CPARAMS,
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
    sums = _stats2_pallas(ee, w1, a1, w2, k)
    mean2 = sums[0] / M + b2                # h2 = y1@W2 + b2
    var2 = sums[1] / M - (sums[0] / M) ** 2
    return {"bn_w1": (m1, v1), "bn_w2": (mean2, jnp.maximum(var2, 0.0)),
            "bn_x": (mx, vx)}


# --------------------------------------------------------------------------
# Backward: three sweeps (BN backward needs global reductions, and the three
# BNs chain — BN2/BNx sums first, then BN1 sums, then apply + input/weight
# grads). Each sweep recomputes its prefix from the edge tensor chunk-by-chunk
# in VMEM; the only large write is the final d_ee.
#
# Train-mode BN absorbs the conv bias that feeds it (x-hat is invariant to a
# constant shift), so d_conv_bias == 0 for conv_w1/conv_w2/conv_x; BN
# gamma/beta grads fall out of the same sums: d_gamma = sum(d_p * x_hat),
# d_beta = sum(d_p).
# --------------------------------------------------------------------------


def _chunk_common(ee, d_out, w1, a1, w2, a2, wx, ax, gb2, wout, cs, k, c, f,
                  neg, cd):
    """Shared recompute + top-of-chain backward for one [cs,k,2C] chunk.

    All matmuls run in compute dtype `cd` with f32 accumulation; the
    elementwise BN/softmax math stays f32."""
    flat = ee.reshape(cs * k, 2 * c)
    diff = flat[:, c:]
    h1 = _mm(diff, w1, cd)
    p1 = h1 * a1[0] + a1[1]
    y1 = _lrelu(p1, neg)
    h2 = _mm(y1, w2, cd)
    p2 = h2 * a2[0] + a2[1]
    y2 = _lrelu(p2, neg).reshape(cs, k, f)
    y2 = y2 - jnp.max(y2, axis=1, keepdims=True)
    e2 = jnp.exp(y2)
    w = e2 / jnp.sum(e2, axis=1, keepdims=True)            # [cs,k,F]
    hx = _mm(flat, wx, cd)
    px = hx * ax[0] + ax[1]
    v = _lrelu(px, neg).reshape(cs, k, f)

    # d_u from conv_out
    d_u = jnp.stack([_mm(d_out, wout[j].T, cd) for j in range(k)], axis=1)
    d_v = d_u * w                                          # [cs,k,F]
    d_wgt = d_u * v
    # softmax bwd over k
    d_y2 = w * (d_wgt - jnp.sum(w * d_wgt, axis=1, keepdims=True))
    d_p2 = d_y2.reshape(cs * k, f) * _dlrelu(p2, neg)
    d_px = d_v.reshape(cs * k, f) * _dlrelu(px, neg)
    xhat2 = (p2 - gb2[1]) / gb2[0]
    return dict(flat=flat, diff=diff, p1=p1, y1=y1, p2=p2, px=px,
                v=v, w=w, d_p2=d_p2, d_px=d_px, xhat2=xhat2, d_out=d_out)


def _bwd_pass1_kernel(ee_ref, dout_ref, w1_ref, a1_ref, w2_ref, a2_ref,
                      wx_ref, ax_ref, gb2_ref, wout_ref,
                      sums_ref, dwout_ref, dbout_ref,
                      *, tq, cs, k, c, f, neg, cd):
    """Accumulate S2a,S2b,Sxa,Sxb (+gamma/beta grads by identity), d_Wout,
    d_bout. sums layout [4, F]: [S2a, S2b, Sxa, Sxb]."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        sums_ref[0] = jnp.zeros_like(sums_ref[0])
        dwout_ref[:, :, :] = jnp.zeros_like(dwout_ref[:, :, :])
        dbout_ref[:, :] = jnp.zeros_like(dbout_ref[:, :])

    w1 = w1_ref[:, :]
    a1 = a1_ref[:, :]
    w2 = w2_ref[:, :]
    a2 = a2_ref[:, :]
    wx = wx_ref[:, :]
    ax = ax_ref[:, :]
    gb2 = gb2_ref[:, :]
    wout = wout_ref[:, :, :]

    def body(ci, _):
        ee = ee_ref[0, pl.ds(ci * cs, cs)]
        d_out = dout_ref[0, ci].astype(jnp.float32)
        i = _chunk_common(ee, d_out, w1, a1, w2, a2, wx, ax, gb2, wout,
                          cs, k, c, f, neg, cd)
        # value-branch x-hat from px: xhatx = (px - betax)/gammax — gammax /
        # betax ride in rows 2,3 of gb2.
        xhatx = (i["px"] - gb2[3]) / gb2[2]
        s2a = jnp.sum(i["d_p2"], axis=0)
        s2b = jnp.sum(i["d_p2"] * i["xhat2"], axis=0)
        sxa = jnp.sum(i["d_px"], axis=0)
        sxb = jnp.sum(i["d_px"] * xhatx, axis=0)
        sums_ref[0] += jnp.stack([s2a, s2b, sxa, sxb])     # [4, F]

        u = i["v"] * i["w"]                                # [cs,k,F]
        dwout_ref[:, :, :] += jnp.stack(
            [_mm(u[:, j, :].T, i["d_out"], cd) for j in range(k)])
        dbout_ref[:, :] += jnp.sum(i["d_out"], axis=0)[None]
        return 0

    jax.lax.fori_loop(0, tq // cs, body, 0)


def _bwd_pass2_kernel(ee_ref, dout_ref, w1_ref, a1_ref, w2_ref, a2_ref,
                      wx_ref, ax_ref, gb2_ref, wout_ref, s2_ref, gb1_ref,
                      out1_ref, dw2_ref, *, tq, cs, k, c, f, f2, m, neg, cd):
    """With BN2 sums known: d_h2 -> d_p1; accumulate S1a,S1b and d_W2."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out1_ref[0] = jnp.zeros_like(out1_ref[0])
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref[:, :])

    w1 = w1_ref[:, :]
    a1 = a1_ref[:, :]
    w2 = w2_ref[:, :]
    a2 = a2_ref[:, :]
    wx = wx_ref[:, :]
    ax = ax_ref[:, :]
    gb2 = gb2_ref[:, :]
    wout = wout_ref[:, :, :]
    s2 = s2_ref[0]                                         # [4, F]
    gb1 = gb1_ref[:, :]

    def body(ci, _):
        ee = ee_ref[0, pl.ds(ci * cs, cs)]
        d_out = dout_ref[0, ci].astype(jnp.float32)
        i = _chunk_common(ee, d_out, w1, a1, w2, a2, wx, ax, gb2, wout,
                          cs, k, c, f, neg, cd)
        d_h2 = a2[0] * (i["d_p2"] - s2[0] / m - i["xhat2"] * (s2[1] / m))
        d_y1 = _mm(d_h2, w2.T, cd)
        d_p1 = d_y1 * _dlrelu(i["p1"], neg)
        xhat1 = (i["p1"] - gb1[1]) / gb1[0]
        s1a = jnp.sum(d_p1, axis=0)
        s1b = jnp.sum(d_p1 * xhat1, axis=0)
        out1_ref[0] += jnp.stack([s1a, s1b])               # [2, F2]
        dw2_ref[:, :] += _mm(i["y1"].T, d_h2, cd)          # [F2, F]
        return 0

    jax.lax.fori_loop(0, tq // cs, body, 0)


def _bwd_pass3_kernel(ee_ref, dout_ref, w1_ref, a1_ref, w2_ref, a2_ref,
                      wx_ref, ax_ref, gb2_ref, wout_ref, s2_ref, gb1_ref,
                      s1_ref, dee_ref, dw1_ref, dwx_ref,
                      *, tq, cs, k, c, f, f2, m, neg, cd):
    """Apply all BN backwards; write d_ee; accumulate d_W1, d_Wx."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref[:, :])
        dwx_ref[:, :] = jnp.zeros_like(dwx_ref[:, :])

    w1 = w1_ref[:, :]
    a1 = a1_ref[:, :]
    w2 = w2_ref[:, :]
    a2 = a2_ref[:, :]
    wx = wx_ref[:, :]
    ax = ax_ref[:, :]
    gb2 = gb2_ref[:, :]
    wout = wout_ref[:, :, :]
    s2 = s2_ref[0]
    gb1 = gb1_ref[:, :]
    s1 = s1_ref[0]                                         # [2, F2]

    def body(ci, _):
        ee = ee_ref[0, pl.ds(ci * cs, cs)]
        d_out = dout_ref[0, ci].astype(jnp.float32)
        i = _chunk_common(ee, d_out, w1, a1, w2, a2, wx, ax, gb2, wout,
                          cs, k, c, f, neg, cd)
        d_h2 = a2[0] * (i["d_p2"] - s2[0] / m - i["xhat2"] * (s2[1] / m))
        d_y1 = _mm(d_h2, w2.T, cd)
        d_p1 = d_y1 * _dlrelu(i["p1"], neg)
        xhat1 = (i["p1"] - gb1[1]) / gb1[0]
        d_h1 = a1[0] * (d_p1 - s1[0] / m - xhat1 * (s1[1] / m))

        xhatx = (i["px"] - gb2[3]) / gb2[2]
        d_hx = ax[0] * (i["d_px"] - s2[2] / m - xhatx * (s2[3] / m))

        d_diff = _mm(d_h1, w1.T, cd)                       # [S, C]
        d_full = _mm(d_hx, wx.T, cd)                       # [S, 2C]
        d_ee = jnp.concatenate([d_full[:, :c], d_full[:, c:] + d_diff],
                               axis=1)
        dee_ref[0, pl.ds(ci * cs, cs)] = d_ee.reshape(cs, k, 2 * c).astype(
            dee_ref.dtype)

        dw1_ref[:, :] += _mm(i["diff"].T, d_h1, cd)        # [C, F2]
        dwx_ref[:, :] += _mm(i["flat"].T, d_hx, cd)        # [2C, F]
        return 0

    jax.lax.fori_loop(0, tq // cs, body, 0)


def _fold_all(params: Dict, stats: Dict, eps: float):
    """All per-pass constants from params + batch stats."""
    g = lambda bn: (params[bn]["scale"].astype(jnp.float32),
                    params[bn]["bias"].astype(jnp.float32))
    a1 = _affine(*stats["bn_w1"], *g("bn_w1"),
                 params["conv_w1"]["bias"].astype(jnp.float32), eps)
    a2 = _affine(*stats["bn_w2"], *g("bn_w2"),
                 params["conv_w2"]["bias"].astype(jnp.float32), eps)
    ax = _affine(*stats["bn_x"], *g("bn_x"),
                 params["conv_x"]["bias"].astype(jnp.float32), eps)
    g2, b2 = g("bn_w2")
    gx, bx = g("bn_x")
    gb2x = jnp.stack([g2, b2, gx, bx]).astype(jnp.float32)   # [4, F]
    g1, b1 = g("bn_w1")
    gb1 = jnp.stack([g1, b1]).astype(jnp.float32)            # [2, F2]
    return a1, a2, ax, gb2x, gb1


def edge_block_train_forward(params: Dict, ee: jax.Array, k: int,
                             neg: float = 0.01, eps: float = 1e-5):
    """Fused train-mode forward. Returns (out [B,N,F], stats dict)."""
    stats = edge_block_train_stats(params, ee, k, eps)
    a1, a2, ax, _, _ = _fold_all(params, stats, eps)
    out = edge_tail_pallas(
        ee,
        params["conv_w1"]["kernel"].astype(jnp.float32), a1,
        params["conv_w2"]["kernel"].astype(jnp.float32), a2,
        params["conv_x"]["kernel"].astype(jnp.float32), ax,
        params["out_kernel"].astype(jnp.float32),
        params["out_bias"][None].astype(jnp.float32),
        k=k, neg=neg)
    return out, stats


@functools.partial(jax.jit,
                   static_argnames=("k", "neg", "eps", "tq", "cs"))
def edge_block_train_backward(params: Dict, ee: jax.Array, stats: Dict,
                              d_out: jax.Array, k: int, neg: float = 0.01,
                              eps: float = 1e-5, tq: int = 1024, cs: int = 256):
    """Three-sweep fused backward (chunked). Returns (d_params, d_ee)."""
    B, N, kk, C2 = ee.shape
    C = C2 // 2
    F = params["conv_w2"]["kernel"].shape[1]
    F2 = params["conv_w1"]["kernel"].shape[1]
    M = B * N * kk
    tq, cs = _pick_tiles(N, tq, cs)
    grid = (B, N // tq)
    nch = tq // cs
    cd = jnp.bfloat16 if ee.dtype == jnp.bfloat16 else jnp.float32
    d_out4 = d_out.astype(jnp.float32).reshape(B, N // cs, cs, F)

    w1 = params["conv_w1"]["kernel"].astype(jnp.float32)
    w2 = params["conv_w2"]["kernel"].astype(jnp.float32)
    wx = params["conv_x"]["kernel"].astype(jnp.float32)
    wout = params["out_kernel"].astype(jnp.float32)
    a1, a2, ax, gb2x, gb1 = _fold_all(params, stats, eps)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    ee_spec = pl.BlockSpec((1, tq, kk, C2), lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    dout_spec = pl.BlockSpec((1, nch, cs, F), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM)
    common_in = [ee_spec, dout_spec, full(w1), full(a1), full(w2), full(a2),
                 full(wx), full(ax), full(gb2x), full(wout)]
    common_args = (ee, d_out4, w1, a1, w2, a2, wx, ax, gb2x, wout)
    dims = dict(tq=tq, cs=cs, k=k, c=C, f=F, neg=neg, cd=cd)

    sums, d_wout, d_bout = pl.pallas_call(
        functools.partial(_bwd_pass1_kernel, **dims),
        grid=grid,
        in_specs=common_in,
        out_specs=(acc((1, 4, F)), acc((kk, F, F)), acc((1, F))),
        out_shape=(jax.ShapeDtypeStruct((1, 4, F), jnp.float32),
                   jax.ShapeDtypeStruct((kk, F, F), jnp.float32),
                   jax.ShapeDtypeStruct((1, F), jnp.float32)),
        compiler_params=_CPARAMS,
    )(*common_args)

    s1, d_w2 = pl.pallas_call(
        functools.partial(_bwd_pass2_kernel, f2=F2, m=M, **dims),
        grid=grid,
        in_specs=common_in + [full(sums), full(gb1)],
        out_specs=(acc((1, 2, F2)), acc((F2, F))),
        out_shape=(jax.ShapeDtypeStruct((1, 2, F2), jnp.float32),
                   jax.ShapeDtypeStruct((F2, F), jnp.float32)),
        compiler_params=_CPARAMS,
    )(*common_args, sums, gb1)

    d_ee, d_w1, d_wx = pl.pallas_call(
        functools.partial(_bwd_pass3_kernel, f2=F2, m=M, **dims),
        grid=grid,
        in_specs=common_in + [full(sums), full(gb1), full(s1)],
        out_specs=(ee_spec, acc((C, F2)), acc((C2, F))),
        out_shape=(jax.ShapeDtypeStruct((B, N, kk, C2), ee.dtype),
                   jax.ShapeDtypeStruct((C, F2), jnp.float32),
                   jax.ShapeDtypeStruct((C2, F), jnp.float32)),
        compiler_params=_CPARAMS,
    )(*common_args, sums, gb1, s1)

    zeros = jnp.zeros
    d_params = {
        "conv_w1": {"kernel": d_w1, "bias": zeros((F2,), jnp.float32)},
        "conv_w2": {"kernel": d_w2, "bias": zeros((F,), jnp.float32)},
        "conv_x": {"kernel": d_wx, "bias": zeros((F,), jnp.float32)},
        "out_kernel": d_wout,
        "out_bias": d_bout[0],
        # d_gamma = sum(d_p * xhat), d_beta = sum(d_p)
        "bn_w1": {"scale": s1[0, 1], "bias": s1[0, 0]},
        "bn_w2": {"scale": sums[0, 1], "bias": sums[0, 0]},
        "bn_x": {"scale": sums[0, 3], "bias": sums[0, 2]},
    }
    return d_params, d_ee


# ------------------------------------------------------------------ API
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_edge_block(params: Dict, ee: jax.Array, k: int, neg: float = 0.01,
                     eps: float = 1e-5):
    """Differentiable fused train-mode EdgeBlock: (out [B,N,F], stats).

    `stats` carries the batch (mean, var) per BN for running-average updates;
    it receives no gradient.
    """
    out, stats = edge_block_train_forward(params, ee, k, neg, eps)
    return out, stats


def _feb_fwd(params, ee, k, neg, eps):
    out, stats = edge_block_train_forward(params, ee, k, neg, eps)
    return (out, stats), (params, ee, stats)


def _feb_bwd(k, neg, eps, res, g):
    params, ee, stats = res
    d_out, _ = g
    d_params, d_ee = edge_block_train_backward(params, ee, stats, d_out,
                                               k, neg, eps)
    # cast param grads to the param dtypes
    d_params = jax.tree.map(lambda gg, p: gg.astype(p.dtype), d_params,
                            params)
    return d_params, d_ee.astype(ee.dtype)


fused_edge_block.defvjp(_feb_fwd, _feb_bwd)
