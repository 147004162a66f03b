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
        """x: [B, N, 3] -> logits [B, 1] (always float32)."""
        dtype = jnp.bfloat16 if self.cfg.d_bf16 else jnp.float32
        bn = lambda name, v: SPBatchNorm(
            name=name, groups=self.cfg.bn_groups)(v, train=train)

        h = x.astype(dtype)
        for i, width in enumerate((64, 128, 256)):
            h = TorchDense(width, name=f"mlp{i + 1}")(h)
            h = nn.leaky_relu(bn(f"bn{i + 1}", h), NEG)

        dim = 1024 // (2 if self.cfg.small_d else 1)
        h = TorchDense(dim, name="fc2")(h)
        h = nn.leaky_relu(bn("bn_fc2", h), NEG)

        h = jnp.max(h, axis=1).astype(jnp.float32)     # adaptive max pool

        for i, width in enumerate((512, 256, 64)):
            h = nn.leaky_relu(TorchDense(width, name=f"head{i + 1}")(h), NEG)
        return TorchDense(1, name="head4")(h)
