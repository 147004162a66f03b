"""Fused eval-mode generator forward — the serving path.

Functionally identical to `Generator.__call__(train=False)` (asserted by
`tests/test_fused_eval.py`), but the two EdgeBlocks run through the fused
Pallas tail kernel (`ops.pallas.edgeblock`) and all BN layers are folded
affines. Dense layers (head/global/tail/adain) stay XLA — they fuse fine.

Supports the default architecture (eql/attn/use_head off — the reference's
shipped configuration); other flag combinations fall back to `G.apply`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sp_gan_tpu.config import Config
from sp_gan_tpu.ops.pallas.edgeblock import edge_block_eval


def _dense(p: Dict, x, act_neg: Optional[float] = None):
    y = x @ p["kernel"] + p["bias"]
    if act_neg is not None:
        y = jnp.where(y >= 0, y, act_neg * y)
    return y


def _bn_eval(p: Dict, s: Dict, x, eps: float = 1e-5):
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    return (x - s["mean"]) * inv + p["bias"]


def _instance_norm(x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _adain(p: Dict, x, style):
    gb = style @ p["style_kernel"] + p["style_bias"]
    C = x.shape[-1]
    return gb[..., :C] * _instance_norm(x) + gb[..., C:]


def supports_fused(cfg: Config) -> bool:
    # per-shard BN stats (cfg.bn_stats) are not implemented by the fused
    # kernels — they compute/fold global batch statistics; the bf16 stability
    # sub-modes (_g/_d/_tail32) fall back to the flax graph
    return not (cfg.eql or cfg.attn or cfg.use_head or cfg.bn_groups > 1
                or cfg.dtype in ("bfloat16_g", "bfloat16_d",
                                 "bfloat16_tail32"))


def generator_forward_eval(cfg: Config, variables: Dict, x: jax.Array,
                           z: jax.Array, edge1_idx=None) -> jax.Array:
    """Fused eval forward: x [B,N,3], z [B,N,nz] -> [B,N,3]."""
    assert supports_fused(cfg), "flag combo not supported by the fused path"
    p = variables["params"]
    s = variables["batch_stats"]
    B, N, _ = x.shape
    k = cfg.nk // 2

    if cfg.z_norm:
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    style = _dense(p["head2"], _dense(p["head1"],
                                      jnp.concatenate([x, z], -1), 0.01), 0.01)

    x1 = edge_block_eval(p["edge1"], s["edge1"], x, k, idx=edge1_idx)
    x1 = jnp.where(x1 >= 0, x1, 0.2 * x1)
    x1 = _adain(p["adain1"], x1, style)

    x2 = edge_block_eval(p["edge2"], s["edge2"], x1, k)
    x2 = jnp.where(x2 >= 0, x2, 0.2 * x2)
    x2 = _adain(p["adain2"], x2, style)

    g = jnp.max(x2, axis=1)
    g = _bn_eval(p["global_bn1"], s["global_bn1"], _dense(p["global1"], g))
    g = jnp.where(g >= 0, g, 0.01 * g)
    g = _bn_eval(p["global_bn2"], s["global_bn2"], _dense(p["global2"], g))
    g = jnp.where(g >= 0, g, 0.01 * g)
    g = jnp.broadcast_to(g[:, None, :], (B, N, g.shape[-1]))

    feat = jnp.concatenate([g, x2], axis=-1)
    out = _dense(p["tail2"], _dense(p["tail1"], feat, 0.01), 0.01)
    out = jnp.tanh(_dense(p["tail3"], out))
    if cfg.off:
        out = out + x
    return out
