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


@partial(jax.jit, static_argnames=("emd_iters", "points_axis", "data_axis"))
def cutmix(
    rng: jax.Array,
    real: jax.Array,
    fake: jax.Array,
    emd_eps: float = 0.005,
    emd_iters: int = 300,
    points_axis: str = None,
    data_axis: str = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """real/fake: [B, N, 3] -> (mixed [B,N,3], map_s [B], mask [B,N]).

    mask==1 -> point kept from real; map_s = mean(mask) (the soft label the
    reference feeds to `mix_loss`).

    With `points_axis`/`data_axis` set (called INSIDE the point-sharded train
    step's `shard_map`), real/fake are local shards: the lam/anchor/flip
    draws are global-batch-shaped and row-sliced (bit-identical to the
    unsharded draws), the anchor point is fetched from its owner shard by a
    psum, the farthest-`num` ranking runs on the all-gathered [B, N] anchor
    distances (scalars — cheap), and the EMD alignment routes through
    `parallel.points.emd_auction_local` so the [N, N/P] distance tile stays
    shard-local. Returns the row-local slices of (mixed, map_s, mask).
    """
    B, N_local, _ = real.shape
    k_lam, k_anchor, k_flip = jax.random.split(rng, 3)
    sharded = points_axis is not None

    if sharded:
        n_pts = jax.lax.axis_size(points_axis)
        N = N_local * n_pts
        row_base = jax.lax.axis_index(points_axis) * N_local
    else:
        N = N_local
    if data_axis is not None:
        n_data = jax.lax.axis_size(data_axis)
        dd = jax.lax.axis_index(data_axis)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, dd * B, B, 0)
    else:
        n_data, sl = 1, lambda a: a

    lam = sl(jax.random.uniform(k_lam, (B * n_data,)))    # Beta(1,1) == U(0,1)
    num = (lam * N).astype(jnp.int32)
    anchor = sl(jax.random.randint(k_anchor, (B * n_data,), 0, N))

    if sharded:
        # fetch each item's anchor point from its owner shard (psum of the
        # one-owner contribution), then rank on the gathered [B, N] distance
        # scalars — same expanded-form distances as the dense path
        mine = (anchor >= row_base) & (anchor < row_base + N_local)
        a_local = jnp.clip(anchor - row_base, 0, N_local - 1)
        a_pt = jnp.take_along_axis(real, a_local[:, None, None], axis=1)
        a_pt = jax.lax.psum(
            jnp.where(mine[:, None, None], a_pt, 0.0), points_axis)  # [B,1,3]
        # anchor as the QUERY row: the same |x_a|^2 - 2 x_a.x_j + |x_j|^2
        # summation order as the dense path's [anchor, :] row, so fp
        # rounding (and thus rank ties) match bit-for-bit
        d_local = pairwise_sqdist(a_pt, real)[:, 0, :]               # [B,Nl]
        d_anchor = jax.lax.all_gather(d_local, points_axis,
                                      axis=1, tiled=True)            # [B,N]
    else:
        d = pairwise_sqdist(real, real)                   # [B, N, N]
        d_anchor = jnp.take_along_axis(d, anchor[:, None, None], axis=1)[:, 0]
    # rank points by distance to anchor, farthest first (reference topk)
    order = jnp.argsort(-d_anchor, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    if sharded:
        rank = jax.lax.dynamic_slice_in_dim(rank, row_base, N_local, 1)
    replace = rank < num[:, None]                          # farthest `num` pts
    mask = 1.0 - replace.astype(real.dtype)                # 1 = keep real

    flip = jax.random.bernoulli(k_flip)
    mask = jnp.where(flip, 1.0 - mask, mask)

    # EMD-align fake to real so replacements land in matching locations
    if sharded:
        from sp_gan_tpu.parallel.points import emd_auction_local

        _, assignment = emd_auction_local(real, fake, emd_eps, emd_iters,
                                          axis=points_axis, phases=1)
        fake_full = jax.lax.all_gather(fake, points_axis, axis=1, tiled=True)
        aligned_fake = jnp.take_along_axis(fake_full, assignment[..., None],
                                           axis=1)
    else:
        _, assignment = emd_auction(real, fake, emd_eps, emd_iters, True)
        aligned_fake = jnp.take_along_axis(fake, assignment[..., None], axis=1)
    aligned_fake = jax.lax.stop_gradient(aligned_fake)

    mixed = mask[..., None] * real + (1.0 - mask[..., None]) * aligned_fake
    map_s = mask.mean(axis=-1)
    if sharded:
        map_s = jax.lax.pmean(map_s, points_axis)
    return mixed, map_s, mask
