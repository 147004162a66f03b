"""Gradient penalties — rebuild of
`/root/reference/Common/loss_utils.py:993-1131` and
`Common/gradient_penalty.py`.

Both penalties differentiate *through* the discriminator with `jax.grad`
(second-order under jit — XLA handles the double backward), instead of the
reference's `torch.autograd.grad(create_graph=True)`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def r1_penalty(d_apply: Callable[[Array], Array], real: Array) -> Array:
    """Zero-centered gradient penalty on real data
    (`gradient_penalty`, loss_utils.py:993-1018): E[ ||∇_x D(x)||^2 ]."""

    def d_sum(x):
        return d_apply(x).sum()

    grads = jax.grad(d_sum)(real)
    return jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1))


def wgan_gp(
    d_apply: Callable[[Array], Array],
    real: Array,
    fake: Array,
    rng: Array,
    lambda_gp: float = 10.0,
    gamma: float = 1.0,
    emd_pairing: bool = False,
    emd_eps: float = 0.005,
    emd_iters: int = 300,
    points_axis: str = None,
    data_axis: str = None,
) -> Array:
    """WGAN-GP on random interpolates (`GradientPenalty.__call__`,
    loss_utils.py:1083-1131): lambda * E[(||∇D(x_hat)||/gamma - 1)^2].

    emd_pairing=True is the reference's `mapping=True` branch
    (loss_utils.py:1102-1120): match each fake point to a real point through
    the EMD auction assignment (eps=0.005, 300 iters there), permute the
    real cloud into fake order, and interpolate the *paired* points —
    interpolates stay on plausible shapes instead of blending unrelated
    points. The assignment is a piecewise-constant integer map (no gradient
    flows through it; the reference's `ass.long()` likewise detaches).

    Inside the point-sharded train step (an enclosing `shard_map` over a
    (data x points) mesh) pass `points_axis`/`data_axis`: real/fake are then
    the LOCAL shards, the interpolation alphas are drawn global-batch-shaped
    and row-sliced (bit-identical to the unsharded draw, like
    `step.local_z`), the gradient norm sums its squares over the whole cloud
    via psum over `points_axis` (a per-shard norm would penalize slice norms
    — wrong), and EMD pairing routes through
    `parallel.points.emd_auction_local`."""
    B = real.shape[0]
    if data_axis is not None:
        n_data = jax.lax.axis_size(data_axis)
        alpha_all = jax.random.uniform(rng, (B * n_data, 1, 1),
                                       dtype=real.dtype)
        alpha = jax.lax.dynamic_slice_in_dim(
            alpha_all, jax.lax.axis_index(data_axis) * B, B, 0)
    else:
        alpha = jax.random.uniform(rng, (B, 1, 1), dtype=real.dtype)
    if emd_pairing:
        if points_axis is not None:
            from sp_gan_tpu.parallel.points import emd_auction_local

            _, ass = emd_auction_local(fake, real, emd_eps, emd_iters,
                                       axis=points_axis, phases=1)
            real_full = jax.lax.all_gather(real, points_axis, axis=1,
                                           tiled=True)
            real_paired = jnp.take_along_axis(
                real_full, jax.lax.stop_gradient(ass)[..., None], axis=1)
        else:
            from sp_gan_tpu.ops.emd import emd_auction

            _, ass = emd_auction(fake, real, emd_eps, emd_iters)
            real_paired = jnp.take_along_axis(
                real, jax.lax.stop_gradient(ass)[..., None], axis=1)
        # reference orientation: alpha*fake + (1-alpha)*real[ass]
        interp = real_paired + alpha * (fake - real_paired)
    else:
        interp = fake + alpha * (real - fake)

    def d_sum(x):
        return d_apply(x).sum()

    grads = jax.grad(d_sum)(interp)
    sumsq = jnp.sum(grads.reshape(B, -1) ** 2, axis=-1)
    if points_axis is not None:
        # Under an enclosing manual shard_map the inner grad is P_points x
        # the true interpolate gradient: every points shard computes the
        # SAME replicated d_sum (D's pools/norms gather over `points`), the
        # inner VJP seeds 1 on each shard, and the all_gather transposes
        # psum all those identical cotangent contributions into each
        # shard's slice. psum of the squares then gives P^2 * ||g||^2 —
        # normalize back before the sqrt. (Data-axis cross-item BN-stat
        # contributions are NOT replicas — they are the same cross terms
        # the unsharded batch-stats forward has, and carry no such factor.)
        n_pts = jax.lax.axis_size(points_axis)
        sumsq = jax.lax.psum(sumsq, points_axis) / (n_pts * n_pts)
    norms = jnp.sqrt(sumsq + 1e-12)
    return lambda_gp * jnp.mean((norms / gamma - 1.0) ** 2)
