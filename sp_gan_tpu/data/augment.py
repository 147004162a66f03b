"""Jittable, PRNG-explicit point-cloud augmentations — rebuild of the
reference's numpy/torch augmentation surface:

- `normalize_point_cloud` / rotate / scale: `/root/reference/Common/point_operation.py:21-40,84-110,169-184`
- torch transform extras (jitter/translate/rotate-perturbation/dropout):
  `/root/reference/Common/data_utils.py:113-320`

All functions are pure, take an explicit `jax.random` key, operate on batched
`[B, N, 3]` arrays on-device, and are safe inside `jit`/`scan` (the trainer's
on-device input path runs them inside the fused train program). The reference
applies its versions per-item on the host inside DataLoader workers
(`Generation/H5DataLoader.py:111-123`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_point_cloud(pc: jax.Array) -> jax.Array:
    """Center each cloud on its centroid, scale the furthest point to radius
    1. Accepts [N, 3] or [B, N, 3] (reference
    `point_operation.normalize_point_cloud`, :21-40)."""
    pc = jnp.asarray(pc)
    centroid = jnp.mean(pc, axis=-2, keepdims=True)
    pc = pc - centroid
    m = jnp.max(jnp.sqrt(jnp.sum(pc ** 2, axis=-1)), axis=-1)
    return pc / (m[..., None, None] + 1e-12)


def _rot_y(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, z, s], -1),
                      jnp.stack([z, o, z], -1),
                      jnp.stack([-s, z, c], -1)], -2)


def rotate_y_batch(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Per-cloud uniform rotation about the up (y) axis — the reference's
    live augmentation (`rotate_point_cloud_and_gt`, y_rotated=True,
    point_operation.py:84-110)."""
    B = pc.shape[0]
    angles = jax.random.uniform(key, (B,), minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.einsum("bnc,bcd->bnd", pc, _rot_y(angles))


def scale_batch(key: jax.Array, pc: jax.Array,
                lo: float = 0.8, hi: float = 1.25) -> jax.Array:
    """Per-cloud uniform scale (reference `random_scale_point_cloud_and_gt`
    defaults 0.8-1.25, point_operation.py:169-184)."""
    B = pc.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=lo, maxval=hi)
    return pc * s


def augment_batch(key: jax.Array, pc: jax.Array, augment: bool) -> jax.Array:
    """The reference's live `augment=True` pipeline: y-rotation then random
    scale (`H5DataLoader.__getitem__`, :115-117)."""
    if not augment:
        return pc
    k1, k2 = jax.random.split(key)
    return scale_batch(k2, rotate_y_batch(k1, pc))


def shuffle_points_batch(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Independent per-cloud point-order shuffle (the reference shuffles
    every item on load, `H5DataLoader.py:113`). Point order is load-bearing
    for SP-GAN: z-masks and the sphere correspondence index by position."""
    B = pc.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda k, p: jax.random.permutation(k, p, axis=0))(keys, pc)


# ---------------------------------------------------------------------------
# torch-transform extras (`Common/data_utils.py`), defined-but-unused in the
# reference's live path; provided for the generally-useful surface.
# ---------------------------------------------------------------------------

def jitter_batch(key: jax.Array, pc: jax.Array, sigma: float = 0.01,
                 clip: float = 0.05) -> jax.Array:
    """Clipped gaussian per-point jitter (`PointcloudJitter`,
    data_utils.py:113-124)."""
    noise = jnp.clip(sigma * jax.random.normal(key, pc.shape), -clip, clip)
    return pc + noise


def translate_batch(key: jax.Array, pc: jax.Array,
                    translate_range: float = 0.1) -> jax.Array:
    """Per-cloud constant xyz shift (`PointcloudTranslate`,
    data_utils.py:178-186)."""
    t = jax.random.uniform(key, (pc.shape[0], 1, 3),
                           minval=-translate_range, maxval=translate_range)
    return pc + t


def rotate_perturbation_batch(key: jax.Array, pc: jax.Array,
                              angle_sigma: float = 0.06,
                              angle_clip: float = 0.18) -> jax.Array:
    """Small random rotations about all three axes
    (`PointcloudRotatePerturbation`, data_utils.py:230-250)."""
    B = pc.shape[0]
    ang = jnp.clip(angle_sigma * jax.random.normal(key, (B, 3)),
                   -angle_clip, angle_clip)

    def rot(a):
        cx, sx = jnp.cos(a[0]), jnp.sin(a[0])
        cy, sy = jnp.cos(a[1]), jnp.sin(a[1])
        cz, sz = jnp.cos(a[2]), jnp.sin(a[2])
        rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx

    R = jax.vmap(rot)(ang)
    return jnp.einsum("bnc,bdc->bnd", pc, R)


def random_point_dropout(key: jax.Array, pc: jax.Array,
                         max_dropout_ratio: float = 0.875) -> jax.Array:
    """Replace a random fraction of points with the first point
    (`PointcloudRandomInputDropout` semantics, data_utils.py:311-324)."""
    B, N, _ = pc.shape
    kr, ku = jax.random.split(key)
    ratio = jax.random.uniform(kr, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(ku, (B, N)) <= ratio
    return jnp.where(drop[..., None], pc[:, :1, :], pc)
