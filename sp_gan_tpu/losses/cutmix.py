"""CutMix for point clouds — rebuild of `CutMix`
(`/root/reference/Common/loss_utils.py:1025-1075`).

Per item: draw a mix ratio lam ~ Beta(1,1) (uniform), pick a random anchor
point of the real cloud, mark the `lam*N` points *farthest* from it (the
reference's `topk` over distances — largest first), and replace them with the
EMD-aligned fake points; with prob 1/2 the mask is inverted batch-wide.
Returns the mixed clouds, the per-item real fraction (soft D target) and the
per-point mask. Fixed-shape jax throughout: the per-item `topk` loop becomes
a batched rank comparison.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sp_gan_tpu.ops.emd import emd_auction
from sp_gan_tpu.ops.pairwise import pairwise_sqdist


@partial(jax.jit, static_argnames=("emd_iters",))
def cutmix(
    rng: jax.Array,
    real: jax.Array,
    fake: jax.Array,
    emd_eps: float = 0.005,
    emd_iters: int = 300,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """real/fake: [B, N, 3] -> (mixed [B,N,3], map_s [B], mask [B,N]).

    mask==1 -> point kept from real; map_s = mean(mask) (the soft label the
    reference feeds to `mix_loss`).
    """
    B, N, _ = real.shape
    k_lam, k_anchor, k_flip = jax.random.split(rng, 3)

    lam = jax.random.uniform(k_lam, (B,))                 # Beta(1,1) == U(0,1)
    num = (lam * N).astype(jnp.int32)
    anchor = jax.random.randint(k_anchor, (B,), 0, N)

    d = pairwise_sqdist(real, real)                       # [B, N, N]
    d_anchor = jnp.take_along_axis(d, anchor[:, None, None], axis=1)[:, 0]  # [B,N]
    # rank points by distance to anchor, farthest first (reference topk)
    order = jnp.argsort(-d_anchor, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    replace = rank < num[:, None]                          # farthest `num` pts
    mask = 1.0 - replace.astype(real.dtype)                # 1 = keep real

    flip = jax.random.bernoulli(k_flip)
    mask = jnp.where(flip, 1.0 - mask, mask)

    # EMD-align fake to real so replacements land in matching locations
    _, assignment = emd_auction(real, fake, emd_eps, emd_iters, True)
    aligned_fake = jnp.take_along_axis(fake, assignment[..., None], axis=1)
    aligned_fake = jax.lax.stop_gradient(aligned_fake)

    mixed = mask[..., None] * real + (1.0 - mask[..., None]) * aligned_fake
    map_s = mask.mean(axis=-1)
    return mixed, map_s, mask
