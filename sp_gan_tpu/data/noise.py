"""Latent-code samplers — rebuild of the reference's `noise_generator`
(`/root/reference/Generation/model.py:122-154`) as pure, jittable functions.

Modes (matching the reference's flags):
- default: one gaussian code per shape, tiled across all N points
  (`model.py:126-131`);
- `n_rand`: independent per-point codes (`model.py:125-126`);
- `n_mix`: with probability 0.5, overwrite the `num` sphere-nearest points
  around a random anchor with a second code — region mixing driven by the
  precomputed template distance matrix (`model.py:133-141`);
- `masked_z`: one code per mask region (the reference's `masks` branch,
  `model.py:142-150`; its numpy version assigns `idx` by mistake — we assign
  the sampled code, which is the evident intent and what the manipulation
  routines in `model_test.py` rely on).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_z(key: jax.Array, bs: int, n_points: int, nz: int,
             sigma: float = 0.2, n_rand: bool = False, n_mix: bool = False,
             ball_sqdist: Optional[jax.Array] = None,
             sphere: Optional[jax.Array] = None) -> jax.Array:
    """[bs, n_points, nz] latent codes. `sigma` is the reference's `--nv`.

    n_mix region selection needs only the per-anchor distance ROW of the
    template — pass `sphere` [N, 3] to compute it on the fly ([bs, N]
    work), or the precomputed [N, N] `ball_sqdist` (the reference
    precomputes the full matrix, model.py:162-167, which is 1 GB at
    N=16384; the row form costs nothing and scales)."""
    k_z, k_gate, k_z2, k_anchor, k_num = jax.random.split(key, 5)
    if n_rand:
        z = sigma * jax.random.normal(k_z, (bs, n_points, nz))
    else:
        z = jnp.broadcast_to(
            sigma * jax.random.normal(k_z, (bs, 1, nz)), (bs, n_points, nz))

    if n_mix and (ball_sqdist is not None or sphere is not None):
        # one gate per call, p=0.5 (reference `random.random() < 0.5`)
        gate = jax.random.bernoulli(k_gate, 0.5)
        z2 = sigma * jax.random.normal(k_z2, (bs, 1, nz))
        anchor = jax.random.randint(k_anchor, (bs,), 0, n_points)
        u = jax.random.uniform(k_num, (bs,))
        num = (jnp.maximum(u, 0.1) * n_points).astype(jnp.int32)  # [bs]
        if ball_sqdist is not None:
            d = jnp.take(jnp.asarray(ball_sqdist), anchor, axis=0)  # [bs, N]
        else:
            anchors = jnp.take(sphere, anchor, axis=0)              # [bs, 3]
            d = jnp.sum((anchors[:, None, :] - sphere[None]) ** 2, axis=-1)
        # rank of each point by distance-to-anchor; the `num` nearest get z2
        order = jnp.argsort(d, axis=1)
        ranks = jnp.argsort(order, axis=1)
        mask = ranks < num[:, None]                               # [bs, N]
        z = jnp.where(gate & mask[..., None], z2, z)
    return z


def masked_z(key: jax.Array, masks: jax.Array, nz: int,
             sigma: float = 0.2) -> jax.Array:
    """[B, N, nz] codes with one shared code per mask region.

    `masks`: [B, N] small non-negative ints labeling regions. Every point
    with the same label (within a batch item) receives the same code.
    """
    masks = jnp.asarray(masks).astype(jnp.int32)
    B, N = masks.shape
    n_labels = int(jax.device_get(masks.max())) + 1
    codes = sigma * jax.random.normal(key, (B, n_labels, nz))
    return codes[jnp.arange(B)[:, None], masks]
