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
) -> Array:
    """WGAN-GP on random interpolates (`GradientPenalty.__call__`,
    loss_utils.py:1083-1131): lambda * E[(||∇D(x_hat)||/gamma - 1)^2].

    emd_pairing=True is the reference's `mapping=True` branch
    (loss_utils.py:1102-1120): match each fake point to a real point through
    the EMD auction assignment (eps=0.005, 300 iters there), permute the
    real cloud into fake order, and interpolate the *paired* points —
    interpolates stay on plausible shapes instead of blending unrelated
    points. The assignment is a piecewise-constant integer map (no gradient
    flows through it; the reference's `ass.long()` likewise detaches)."""
    B = real.shape[0]
    alpha = jax.random.uniform(rng, (B, 1, 1), dtype=real.dtype)
    if emd_pairing:
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
    norms = jnp.sqrt(
        jnp.sum(grads.reshape(B, -1) ** 2, axis=-1) + 1e-12
    )
    return lambda_gp * jnp.mean((norms / gamma - 1.0) ** 2)
