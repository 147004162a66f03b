"""Fused train-mode generator forward — functional twin of
`Generator.__call__(train=True)` with the two EdgeBlocks running through the
fused Pallas train kernels (`ops.pallas.edgeblock_train`).

Same contract as `G.apply(variables, x, z, train=True,
mutable=['batch_stats'])`: returns (out, new_batch_stats). Used by
`make_train_step` when the flag/config allows; the flax Generator remains the
reference implementation (equality asserted in
tests/test_fused_train_generator.py). Supports the default architecture
(eql/attn/use_head off); `supports_fused` guards.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn.fused_eval import supports_fused
from sp_gan_tpu.ops.edge import edge_features
from sp_gan_tpu.ops.pallas.edgeblock_train import fused_edge_block

MOMENTUM = 0.9
NEG = 0.01
NEG2 = 0.2


def _dense(p: Dict, x, act_neg=None):
    y = x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)
    if act_neg is not None:
        y = jnp.where(y >= 0, y, act_neg * y)
    return y


def _bn_train(p: Dict, s: Dict, x, eps: float = 1e-5):
    """Tiny-tensor train-mode BN (global branch); returns (y, (mean, var))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.mean(xf * xf, axis=0) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * p["scale"] + p["bias"]).astype(x.dtype)
    return y, (mean, var)


def _instance_norm(x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _adain(p: Dict, x, style):
    gb = style @ p["style_kernel"].astype(style.dtype) \
        + p["style_bias"].astype(style.dtype)
    C = x.shape[-1]
    return gb[..., :C] * _instance_norm(x) + gb[..., C:]


def _ra(old, batch):
    """Running-average update, matching SPBatchNorm."""
    mean, var = batch
    return {
        "mean": MOMENTUM * old["mean"]
        + (1 - MOMENTUM) * jax.lax.stop_gradient(mean),
        "var": MOMENTUM * old["var"]
        + (1 - MOMENTUM) * jax.lax.stop_gradient(var),
    }


def _edge_block_xla(params: Dict, ee: jax.Array, k: int,
                    neg: float = 0.01, eps: float = 1e-5):
    """Plain-XLA train-mode EdgeBlock on the edge tensor (same math as
    nn.layers.EdgeBlock). Used for blocks whose channel width is too small
    for the Pallas sweeps to be efficient: edge1's [B,N,k,6] tensor pads its
    6-wide lane dim to 128 in VMEM, making the fused kernels cost as much as
    edge2's [B,N,k,128] (trace-verified, BASELINE.md r2) while XLA handles
    the 20x-smaller tensor fine. Returns (out, stats) like fused_edge_block."""
    C = ee.shape[-1] // 2
    f32 = jnp.float32

    def bn_train(p, h):
        hf = h.astype(f32)
        mean = jnp.mean(hf, axis=(0, 1, 2))
        var = jnp.mean(hf * hf, axis=(0, 1, 2)) - mean * mean
        y = (hf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        return y.astype(h.dtype), (mean, var)

    lrelu = lambda v: jnp.where(v >= 0, v, neg * v)
    stats = {}
    w1 = _dense(params["conv_w1"], ee[..., C:])
    w1, stats["bn_w1"] = bn_train(params["bn_w1"], w1)
    w1 = lrelu(w1)
    w2 = _dense(params["conv_w2"], w1)
    w2, stats["bn_w2"] = bn_train(params["bn_w2"], w2)
    w = jax.nn.softmax(lrelu(w2), axis=2)
    v = _dense(params["conv_x"], ee)
    v, stats["bn_x"] = bn_train(params["bn_x"], v)
    v = lrelu(v) * w
    out = jnp.einsum("bnkc,kco->bno", v,
                     params["out_kernel"].astype(v.dtype))
    out = out + params["out_bias"].astype(out.dtype)
    return out, stats


def generator_forward_train(
    cfg: Config,
    params: Dict,
    batch_stats: Dict,
    x: jax.Array,
    z: jax.Array,
    edge1_idx: Optional[jax.Array] = None,
    edge1_ee: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict]:
    """x [B,N,3], z [B,N,nz] -> (out [B,N,3] f32, new_batch_stats)."""
    assert supports_fused(cfg), "flag combo not supported by the fused path"
    B, N, _ = x.shape
    k = cfg.nk // 2

    if cfg.z_norm:
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    style = _dense(params["head2"],
                   _dense(params["head1"], jnp.concatenate([x, z], -1), NEG),
                   NEG)

    new_stats = dict(batch_stats)

    def edge(name, inp, idx, ee=None):
        mixed = cfg.dtype in ("mixed_edge", "bfloat16")
        if ee is not None:
            if mixed:
                ee = ee.astype(jnp.bfloat16)
        elif mixed:
            # mirror EdgeBlock(mixed=True): kNN selection in f32, the big
            # [B,N,k,*] edge tensors and the fused kernels' matmuls in bf16
            if idx is None:
                ee = edge_features(inp, k, out_dtype=jnp.bfloat16)
            else:
                ee = edge_features(inp.astype(jnp.bfloat16), k, idx=idx)
        else:
            ee = edge_features(inp, k, idx=idx)
        if inp.shape[-1] * 2 >= 64:
            out, stats = fused_edge_block(params[name], ee, k, NEG)
        else:
            out, stats = _edge_block_xla(params[name], ee, k, NEG)
        new_stats[name] = {
            bn: _ra(batch_stats[name][bn], stats[bn]) for bn in stats}
        return out.astype(jnp.float32)

    x1 = edge("edge1", x, edge1_idx, edge1_ee)
    x1 = jnp.where(x1 >= 0, x1, NEG2 * x1)
    x1 = _adain(params["adain1"], x1, style)

    x2 = edge("edge2", x1, None)
    x2 = jnp.where(x2 >= 0, x2, NEG2 * x2)
    x2 = _adain(params["adain2"], x2, style)

    g = jnp.max(x2, axis=1)
    g = _dense(params["global1"], g)
    g, st1 = _bn_train(params["global_bn1"], batch_stats["global_bn1"], g)
    new_stats["global_bn1"] = _ra(batch_stats["global_bn1"], st1)
    g = jnp.where(g >= 0, g, NEG * g)
    g = _dense(params["global2"], g)
    g, st2 = _bn_train(params["global_bn2"], batch_stats["global_bn2"], g)
    new_stats["global_bn2"] = _ra(batch_stats["global_bn2"], st2)
    g = jnp.where(g >= 0, g, NEG * g)
    g = jnp.broadcast_to(g[:, None, :], (B, N, g.shape[-1]))

    feat = jnp.concatenate([g, x2], axis=-1)
    out = _dense(params["tail2"], _dense(params["tail1"], feat, NEG), NEG)
    out = jnp.tanh(_dense(params["tail3"], out))
    if cfg.off:
        out = out + x
    return out.astype(jnp.float32), new_stats
