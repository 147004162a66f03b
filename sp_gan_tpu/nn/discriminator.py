"""PointNet-style discriminator — rebuild of
`/root/reference/Generation/Discriminator.py:48-114`.

Shared pointwise MLP 3->64->128->256 (+BN+LeakyReLU 0.01), lift to 1024
(512 with small_d), global max pool over points, FC head
1024->512->256->64->1. Channel-last; the pointwise MLP is three batched
matmuls on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn.layers import SPBatchNorm, TorchDense

NEG = 0.01  # reference `neg` (Discriminator.py:19)


class Discriminator(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, N, 3] -> logits [B, 1] (always float32). Under the
        point-sharded step (cfg.points_axis) the trunk runs on the local
        point slice; BN statistics pmean across shards and the max pool
        all-gathers the per-shard maxima (everything after it is per-cloud
        and replicated across point shards)."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.d_bf16 else jnp.float32
        from sp_gan_tpu.nn.layers import bn_collective_axes
        bn_axes, bn_r0 = bn_collective_axes(cfg)
        bn = lambda name, v: SPBatchNorm(
            name=name, groups=cfg.bn_groups, axis_names=bn_axes,
            replica0_axes=bn_r0)(
            v, train=train)

        h = x.astype(dtype)
        for i, width in enumerate((64, 128, 256)):
            h = TorchDense(width, name=f"mlp{i + 1}")(h)
            h = nn.leaky_relu(bn(f"bn{i + 1}", h), NEG)

        dim = 1024 // (2 if self.cfg.small_d else 1)
        h = TorchDense(dim, name="fc2")(h)

        commute = cfg.pool_commute and cfg.bn_groups == 1 \
            and cfg.points_axis is None and cfg.data_axis is None
        if commute:
            # bn + lrelu + max-pool commuted into reductions-only on the
            # [B, N, dim] tensor (exact — see MaxPoolBNLReLU)
            from sp_gan_tpu.nn.layers import MaxPoolBNLReLU
            h = MaxPoolBNLReLU(name="bn_fc2")(h, train=train)
            h = h.astype(jnp.float32)
        else:
            h = nn.leaky_relu(bn("bn_fc2", h), NEG)
            if cfg.points_axis is not None and not self.is_initializing():
                from sp_gan_tpu.parallel.points import global_max_points
                h = global_max_points(h, cfg.points_axis).astype(jnp.float32)
            else:
                h = jnp.max(h, axis=1).astype(jnp.float32)  # adaptive max

        for i, width in enumerate((512, 256, 64)):
            h = nn.leaky_relu(TorchDense(width, name=f"head{i + 1}")(h), NEG)
        return TorchDense(1, name="head4")(h)
