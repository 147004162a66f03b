"""Sphere-guided generator — rebuild of `/root/reference/Generation/Generator.py:91-198`.

Per-point style from (sphere xyz ⊕ z) -> two attention-EdgeConv blocks with
AdaIN modulation -> global max-pool branch -> MLP tail with tanh. Channel-last
throughout; every pointwise conv is a Dense (batched MXU matmul over B*N rows).

Layer-by-layer parity map (reference line refs):
  head:        Conv(3+nz,128) lrelu(0.01) Conv(128,128) lrelu(0.01)  [:107-114]
  pc_head:     (use_head) Conv(3,64) lrelu(0.01) Conv(64,128) lrelu  [:139-144]
  EdgeConv1:   EdgeBlock(3 or 128 -> 64 or 128, k=nk//2)             [:145-153]
  lrelu(0.2) + adain1(style)                                         [:174-176]
  EdgeConv2:   EdgeBlock(64->128) — kNN in feature space             [:178-180]
  lrelu(0.2) + adain2(style)
  global:      max over N -> Linear(128,128) BN lrelu Linear(128,512)
               BN lrelu -> tile over N                               [:119-126,183-187]
  concat(global 512, x2 128) -> optional Attention(640)              [:189-192]
  tail:        Conv(640,256) lrelu Conv(256,64) lrelu Conv(64,3) tanh [:129-136]
               (always plain Conv1d in the reference, even with --eql)
  off:         output += sphere points                               [:196]
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn.layers import (
    AdaptivePointNorm,
    Attention,
    EdgeBlock,
    TorchDense,
    make_dense,
)

NEG = 0.01     # reference `neg` (Generator.py:22)
NEG2 = 0.2     # reference `neg_2` (Generator.py:23)


class Generator(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, z, train: bool = True, edge1_idx=None,
                 z2=None, blend_mask=None, blend_alpha: float = 0.0,
                 edge1_ee=None, template_batch_const: bool = False):
        """x: sphere points [B, N, 3]; z: latent [B, N, nz] -> [B, N, 3].

        edge1_idx: optional precomputed kNN indices [B, N, k] for the first
        EdgeConv (valid when x is the static sphere template and use_head is
        off — the training-loop case, reference model.py:231).

        template_batch_const: caller guarantees every x[b] is the SAME
        template (the training/sampling case). The first EdgeBlock then runs
        at batch size 1 and broadcasts: z only enters the graph at adain1, so
        the whole block is batch-constant — BN statistics over B identical
        copies equal the B=1 statistics, and the broadcast's backward sums
        d_x1 over the batch, so parameters see identical gradients. Cuts the
        block's [B,N,k,*] HBM traffic B-fold. Ignored with use_head (pc is a
        learned batch-dependent lift) and with per-shard BN groups (B=1 can't
        be split into groups; stats would be identical anyway).

        z2/blend_mask/blend_alpha: style-space (latent) part interpolation
        (`Generator.interpolate(use_latent=True)`, Generator.py:216-232):
        the post-head styles of z and z2 are blended per point where
        blend_mask [N] is 1 — NOT the z codes (blending z is the separate
        non-latent mode, handled by pre-blending z before calling)."""
        cfg = self.cfg
        B, N, _ = x.shape
        Dense = make_dense(cfg.eql)
        dim = 128
        k = cfg.nk // 2
        dtype = jnp.bfloat16 if cfg.g_bf16 else jnp.float32

        x = x.astype(dtype)

        # --- style head (shared weights across both codes) ---
        head1 = Dense(dim, name="head1")
        head2 = Dense(dim, name="head2")

        def mk_style(zz):
            if cfg.z_norm:
                zz = zz / (jnp.linalg.norm(zz, axis=-1, keepdims=True) + 1e-8)
            s = jnp.concatenate([x, zz.astype(dtype)], axis=-1)
            return nn.leaky_relu(head2(nn.leaky_relu(head1(s), NEG)), NEG)

        style = mk_style(z)
        if z2 is not None:
            style2 = mk_style(z2)
            sel = jnp.asarray(blend_mask).reshape(1, -1, 1).astype(style.dtype)
            a = jnp.asarray(blend_alpha, style.dtype)
            style = jnp.where(sel > 0,
                              style * (1 - a) + style2 * a, style)

        # --- point trunk ---
        pc = x
        if cfg.use_head:
            pc = nn.leaky_relu(Dense(dim // 2, name="pc_head1")(pc), NEG)
            pc = nn.leaky_relu(Dense(dim, name="pc_head2")(pc), NEG)
            c1_in, c1_out = dim, dim
        else:
            c1_in, c1_out = 3, 64

        EB = EdgeBlock
        if cfg.remat:
            # save only the gathered edge features; recompute the cheap
            # conv/BN/softmax chains in the backward pass
            EB = nn.remat(
                EB, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "edge_feats"))
        eb_kwargs = {}
        if cfg.bn_groups > 1:
            eb_kwargs["bn_groups"] = cfg.bn_groups
        if cfg.dtype == "mixed_edge":
            # bf16 confined to the EdgeBlock internals (the HBM-bound edge
            # tensors); the trunk, norms, losses and gradients stay f32
            eb_kwargs["mixed"] = True
        bn_axes, bn_r0 = (), ()
        if cfg.points_axis is not None or cfg.data_axis is not None:
            # explicit shard_map step: shard-local edge ops, explicit
            # collectives for every cross-shard BN statistic
            from sp_gan_tpu.nn.layers import bn_collective_axes
            bn_axes, bn_r0 = bn_collective_axes(cfg)
            eb_kwargs["bn_axes"] = bn_axes
            eb_kwargs["bn_replica0_axes"] = bn_r0
            if cfg.points_axis is not None:
                eb_kwargs["points_axis"] = cfg.points_axis
        if eb_kwargs:
            EB = functools.partial(EB, **eb_kwargs)
        if cfg.use_head:
            edge1_idx = None  # pc is a learned lift, not the template
            edge1_ee = None
        edge1 = EB(c1_in, c1_out, k, name="edge1")
        if template_batch_const and not cfg.use_head and cfg.bn_groups == 1:
            i1 = None if edge1_idx is None else edge1_idx[:1]
            e1 = None if edge1_ee is None else edge1_ee[:1]
            x1 = edge1(pc[:1], train, i1, e1)
            x1 = jnp.broadcast_to(nn.leaky_relu(x1, NEG2), (B, N, c1_out))
        else:
            x1 = edge1(pc, train, edge1_idx, edge1_ee)
            x1 = nn.leaky_relu(x1, NEG2)
        x1 = AdaptivePointNorm(c1_out, name="adain1",
                               points_axis=cfg.points_axis)(x1, style)

        win2 = None
        if cfg.knn_mode == "approx" and cfg.points_axis is None \
                and not self.is_initializing():
            # (edge_diff_features clamps the band to N and falls back to
            # exact when it would be degenerate — tiny-N runs are safe)
            # banded feature-kNN: EdgeConv2's neighbor selection restricted
            # to the template's spiral index band |i - j| <= knn_window —
            # O(N*W) instead of O(N^2), ~99% neighbor recall measured at
            # the trained N=8192 checkpoint (runs/probe_approx_knn.jsonl).
            # Runs as the banded twin of the fused kNN+gather kernel
            # (ops/pallas/knn.py::knn_edge_window_pallas) so the one-hot
            # MXU gather and f32 selection are preserved; opt-in via
            # --knn_mode approx (exact = parity contract).
            win2 = cfg.knn_window
        x2 = EB(c1_out, dim, k, name="edge2")(x1, train, window=win2)
        x2 = nn.leaky_relu(x2, NEG2)
        x2 = AdaptivePointNorm(dim, name="adain2",
                               points_axis=cfg.points_axis)(x2, style)

        # --- global branch ---
        from sp_gan_tpu.nn.layers import SPBatchNorm
        if cfg.points_axis is not None and not self.is_initializing():
            from sp_gan_tpu.parallel.points import global_max_points
            feat_global = global_max_points(x2, cfg.points_axis)  # [B, dim]
        else:
            feat_global = jnp.max(x2, axis=1)                     # [B, dim]
        feat_global = Dense(dim, name="global1")(feat_global)
        feat_global = SPBatchNorm(name="global_bn1", groups=cfg.bn_groups,
                                  axis_names=bn_axes,
                                  replica0_axes=bn_r0)(
            feat_global, train=train)
        feat_global = nn.leaky_relu(feat_global, NEG)
        feat_global = Dense(512, name="global2")(feat_global)
        feat_global = SPBatchNorm(name="global_bn2", groups=cfg.bn_groups,
                                  axis_names=bn_axes,
                                  replica0_axes=bn_r0)(
            feat_global, train=train)
        feat_global = nn.leaky_relu(feat_global, NEG)
        feat_global = jnp.broadcast_to(feat_global[:, None, :], (B, N, 512))

        feat_cat = jnp.concatenate([feat_global, x2], axis=-1)  # [B, N, 640]

        if cfg.attn:
            feat_cat = Attention(512 + dim, name="attn",
                                 points_axis=cfg.points_axis)(feat_cat)

        # --- tail (always plain conv in the reference) ---
        if cfg.g_tail_f32:
            feat_cat = feat_cat.astype(jnp.float32)
        out = nn.leaky_relu(TorchDense(256, name="tail1")(feat_cat), NEG)
        out = nn.leaky_relu(TorchDense(64, name="tail2")(out), NEG)
        out = jnp.tanh(TorchDense(3, name="tail3")(out))

        if cfg.off:
            # offset mode adds the sphere coordinates (Generator.py:196 adds
            # `pc`; with use_head the reference's pc is 128-d and that line
            # would crash there too — we always add the 3-d template, the
            # only well-defined reading)
            out = out + x
        return out.astype(jnp.float32)

    def interpolate(self, x, z1, z2, selection, alpha, use_latent: bool = False,
                    train: bool = False):
        """Part-interpolation forward (`Generator.py:200-261`): blend z (or
        style) between two codes on a per-point `selection` mask, then run the
        normal graph. selection: [N] {0,1}; alpha: scalar in [0,1]."""
        sel = selection[None, :, None].astype(z1.dtype)
        if not use_latent:
            z = jnp.where(sel > 0, z1 * (1 - alpha) + z2 * alpha, z1)
            return self(x, z, train=train)
        # latent (style-space) blending: run the shared head on both codes
        # and mix the styles per point (Generator.py:216-232)
        return self(x, z1, train=train, z2=z2, blend_mask=selection,
                    blend_alpha=alpha)
