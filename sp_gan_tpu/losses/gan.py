"""GAN generator/discriminator objectives.

Rebuild of `gen_loss` / `dis_loss` / `mix_loss`
(`/root/reference/Common/loss_utils.py:727-991`) with the same dispatch set
{ls, wgan, hinge, gan, real} and the same label-smoothing / label-flip noise
(`smooth_labels`/`noisy_labels`, loss_utils.py:698-725) — but as pure jittable
functions: label noise is drawn from an explicit PRNG key instead of numpy.

Live-path default is `ls` (LSGAN; Generation/config.py:72) — the reference
never invokes gradient penalty in its shipped loop (model.py:234-307).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _smooth_labels(key, shape, lo=0.9, hi=1.0):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _noisy_labels(key, y, p_flip=0.05):
    """Flip ~p_flip of the labels (reference `noisy_labels`, which draws
    n_select indices with replacement; here each label flips iid with the
    same expected count)."""
    flip = jax.random.bernoulli(key, p_flip, y.shape)
    return jnp.where(flip, 1.0 - y, y)


def gen_loss(
    d_real: Optional[Array],
    d_fake: Array,
    gan: str = "ls",
    weight: float = 1.0,
    noise_label: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Generator objective. d_* are discriminator logits [B, 1] or [B]."""
    d_fake = d_fake.reshape(-1)
    gan = gan.lower()
    if gan == "wgan":
        loss = -d_fake.mean() * weight
        return loss, {"g_loss": loss}
    if gan == "hinge":
        loss = -d_fake.mean() * weight
        return loss, {"g_loss": loss}
    if gan == "ls":
        label = jnp.ones_like(d_fake)
        if noise_label:
            assert rng is not None
            label = _noisy_labels(rng, label, 0.05)
        loss = jnp.mean((d_fake - label) ** 2) * weight
        return loss, {"g_loss": loss}
    if gan == "gan":
        loss = jnp.mean(
            -jax.nn.log_sigmoid(d_fake)
        ) * weight  # BCE-with-logits against target 1
        return loss, {"g_loss": loss}
    if gan == "real":
        # relativistic LSGAN (loss_utils.py:790-800)
        assert d_real is not None
        d_real = d_real.reshape(-1)
        d_loss = jnp.mean((d_real - d_fake.mean() + 1.0) ** 2)
        g_loss = jnp.mean((d_fake - d_real.mean() - 1.0) ** 2)
        loss = 0.5 * (g_loss + d_loss) * weight
        return loss, {"g_loss": loss}
    raise NotImplementedError(f"gan={gan}")


def dis_loss(
    d_real: Array,
    d_fake: Array,
    gan: str = "ls",
    weight: float = 1.0,
    noise_label: bool = False,
    rng: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Discriminator objective; info dict carries real/fake accuracy the way
    the reference reports it (loss_utils.py:905-917, threshold 0.5 for ls)."""
    d_real = d_real.reshape(-1)
    d_fake = d_fake.reshape(-1)
    gan = gan.lower()

    if gan == "wgan":
        loss = (d_fake.mean() - d_real.mean()) * weight
        info = {
            "d_loss": loss,
            "real_acc": jnp.mean((d_real >= 0).astype(jnp.float32)),
            "fake_acc": jnp.mean((d_fake < 0).astype(jnp.float32)),
        }
        return loss, info
    if gan == "hinge":
        loss_real = jax.nn.relu(1.0 - d_real).mean()
        loss_fake = jax.nn.relu(1.0 + d_fake).mean()
        loss = (loss_real + loss_fake) * weight
        acc = (jnp.sum(d_real >= 0) + jnp.sum(d_fake < 0)) / (
            d_real.shape[0] + d_fake.shape[0]
        )
        info = {"d_loss": loss, "real_acc": acc.astype(jnp.float32),
                "fake_acc": acc.astype(jnp.float32)}
        return loss, info
    if gan == "ls":
        real_label = jnp.ones_like(d_real)
        fake_label = jnp.zeros_like(d_fake)
        if noise_label:
            assert rng is not None
            k1, k2 = jax.random.split(rng)
            real_label = _smooth_labels(k1, d_real.shape)
            real_label = _noisy_labels(k2, real_label, 0.05)
        loss = (
            jnp.mean((d_real - real_label) ** 2)
            + jnp.mean((d_fake - fake_label) ** 2)
        ) * weight
        info = {
            "d_loss": loss,
            "real_acc": jnp.mean((d_real >= 0.5).astype(jnp.float32)),
            "fake_acc": jnp.mean((d_fake < 0.5).astype(jnp.float32)),
        }
        return loss, info
    if gan == "gan":
        loss = (
            jnp.mean(-jax.nn.log_sigmoid(d_real))
            + jnp.mean(-jax.nn.log_sigmoid(-d_fake))
        ) * weight
        info = {
            "d_loss": loss,
            "real_acc": jnp.mean((d_real >= 0).astype(jnp.float32)),
            "fake_acc": jnp.mean((d_fake < 0).astype(jnp.float32)),
        }
        return loss, info
    if gan == "real":
        d_loss = 0.5 * (
            jnp.mean((d_real - d_fake.mean() - 1.0) ** 2)
            + jnp.mean((d_fake - d_real.mean() + 1.0) ** 2)
        ) * weight
        info = {
            "d_loss": d_loss,
            "real_acc": jnp.mean((d_real >= 0).astype(jnp.float32)),
            "fake_acc": jnp.mean((d_fake < 0).astype(jnp.float32)),
        }
        return d_loss, info
    raise NotImplementedError(f"gan={gan}")


def mix_loss(d_mix: Array, gan: str = "ls", weight: float = 1.0):
    """CutMix discriminator loss on mixed samples (loss_utils.py:805-852):
    mixed clouds are labeled fake."""
    d_mix = d_mix.reshape(-1)
    gan = gan.lower()
    if gan == "ls":
        loss = jnp.mean(d_mix ** 2) * weight
        return loss, {"mix_loss": loss}
    if gan == "gan":
        loss = jnp.mean(-jax.nn.log_sigmoid(-d_mix)) * weight
        return loss, {"mix_loss": loss}
    raise NotImplementedError(f"gan={gan}")
