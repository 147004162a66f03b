"""Fused eval-mode EdgeBlock tail kernel (the serving path).

In eval mode every BatchNorm is a constant per-channel affine, so the whole
EdgeBlock after the neighbor gather —
    conv_w1 -> bn -> lrelu -> conv_w2 -> bn -> lrelu -> softmax_k,
    conv_x -> bn -> lrelu, product, conv_out
— collapses into four matmuls plus elementwise ops with *no* intermediate
leaving VMEM. XLA materializes each stage's [B, N, k, F] tensor to HBM
(~6 round-trips); this kernel reads the edge tensor once and writes [B, N, F].

Used by the eval/generation path (`sp_gan_tpu.nn.fused_eval`); training keeps
the XLA graph (train-mode BN needs global batch statistics).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _edge_tail_kernel(ee_ref, w1_ref, a1_ref, w2_ref, a2_ref, wx_ref, ax_ref,
                      wout_ref, bout_ref, out_ref, *, tq: int, cs: int,
                      k: int, c: int, f2: int, f: int, neg: float, cd):
    w1 = w1_ref[:, :].astype(cd)
    w2 = w2_ref[:, :].astype(cd)
    wx = wx_ref[:, :].astype(cd)
    a1, a2, ax = a1_ref[:, :], a2_ref[:, :], ax_ref[:, :]
    lrelu = lambda v: jnp.where(v >= 0, v, neg * v)

    # bf16 pins DEFAULT precision (Mosaic rejects fp32 contract precision on
    # bf16 inputs); f32 follows jax_default_matmul_precision
    prec = jax.lax.Precision.DEFAULT if cd == jnp.bfloat16 else None

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def body(ci, _):
        ee = ee_ref[0, pl.ds(ci * cs, cs)]               # [cs, k, 2C]
        flat = ee.reshape(cs * k, 2 * c)
        diff = flat[:, c:]

        # attention branch; a* rows: [0]=scale, [1]=shift (conv bias + BN)
        h = mm(diff, w1) * a1[0] + a1[1]
        h = lrelu(h)
        h = mm(h, w2) * a2[0] + a2[1]
        h = lrelu(h).reshape(cs, k, f)
        h = h - jnp.max(h, axis=1, keepdims=True)        # softmax over k
        eh = jnp.exp(h)
        w = eh / jnp.sum(eh, axis=1, keepdims=True)

        # value branch
        v = mm(flat, wx) * ax[0] + ax[1]
        v = lrelu(v).reshape(cs, k, f)
        v = v * w

        # conv_out: contraction over (k, F) — unrolled over k (a single
        # lane-merged matmul compiles in jax 0.9 Mosaic but the relayout
        # copies cost more than the loop; measured in scripts/exp_kloop*.py)
        out = bout_ref[0] + jnp.zeros((cs, f), jnp.float32)
        for j in range(k):
            out = out + mm(v[:, j, :], wout_ref[j])
        out_ref[0, pl.ds(ci * cs, cs)] = out
        return 0

    jax.lax.fori_loop(0, tq // cs, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "neg", "tq", "cs"))
def edge_tail_pallas(ee: jax.Array, w1, a1, w2, a2, wx, ax, wout, bout,
                     k: int, neg: float = 0.01, tq: int = 1024,
                     cs: int = 256) -> jax.Array:
    """ee: [B, N, k, 2C] -> [B, N, F] fused eval EdgeBlock tail.

    w1 [C,F2], w2 [F2,F], wx [2C,F], wout [k, F, F]; a1/a2/ax are [2, width]
    (scale row, shift row); bout [1, F]. A bf16 `ee` runs the chain matmuls
    in bf16 with f32 accumulation (mixed_edge numerics); f32 stays exact.
    """
    B, N, kk, C2 = ee.shape
    C = C2 // 2
    F2 = w1.shape[1]
    F = w2.shape[1]
    while N % tq:
        tq //= 2
    cs = min(cs, tq)
    while tq % cs:
        cs //= 2
    cd = jnp.bfloat16 if ee.dtype == jnp.bfloat16 else jnp.float32
    grid = (B, N // tq)
    kernel = functools.partial(_edge_tail_kernel, tq=tq, cs=cs, k=k, c=C,
                               f2=F2, f=F, neg=neg, cd=cd)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, kk, C2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(a1), full(w2), full(a2), full(wx), full(ax),
            full(wout), full(bout),
        ],
        out_specs=pl.BlockSpec((1, tq, F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * k * (C * F2 + F2 * F + 2 * C * F + F * F),
            transcendentals=B * N * k * F,
            bytes_accessed=B * N * k * C2 * 4 + B * N * F * 4),
        compiler_params=_CPARAMS,
    )(ee, w1, a1, w2, a2, wx, ax, wout, bout)


def _fold_bn(dense: Dict, bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """(conv kernel, bias) + eval BN -> (kernel, [scale; shift])."""
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    shift = (dense["bias"] - bn_stats["mean"]) * inv + bn_params["bias"]
    aff = jnp.stack([inv, shift]).astype(jnp.float32)
    return dense["kernel"].astype(jnp.float32), aff


def edge_block_eval(params: Dict, stats: Dict, x: jax.Array, k: int,
                    idx=None, neg: float = 0.01) -> jax.Array:
    """Fused eval forward of one EdgeBlock given its param/stat dicts
    (layout of `nn.layers.EdgeBlock`): [B, N, C] -> [B, N, F]."""
    from sp_gan_tpu.ops.edge import edge_features

    ee = edge_features(x, k, idx=idx)
    w1, a1 = _fold_bn(params["conv_w1"], params["bn_w1"], stats["bn_w1"])
    w2, a2 = _fold_bn(params["conv_w2"], params["bn_w2"], stats["bn_w2"])
    wx, ax = _fold_bn(params["conv_x"], params["bn_x"], stats["bn_x"])
    wout = params["out_kernel"].astype(jnp.float32)        # [k, F, F]
    bout = params["out_bias"][None].astype(jnp.float32)
    return edge_tail_pallas(ee.astype(jnp.float32), w1, a1, w2, a2, wx, ax,
                            wout, bout, k=k, neg=neg)
