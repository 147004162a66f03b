"""Sphere templates — rebuild of the reference's template loader
(`/root/reference/Generation/model.py:156-180` loads `template/balls/{N}.xyz`
and `pc_normalize`s it, `model.py:46-52`).

The reference ships pre-sampled unit-sphere files; we generate a deterministic
fibonacci lattice instead (same geometry class: near-uniform points on S²) and
accept a `path=` to load the reference's own `.xyz` templates for parity runs.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=8)
def fibonacci_sphere(n: int) -> np.ndarray:
    """Deterministic near-uniform lattice of n points on the unit sphere,
    [n, 3] float32, y as the polar axis (shapes are y-up; `rotate_y_batch`
    then spins around the symmetry axis)."""
    i = np.arange(n, dtype=np.float64)
    golden = (1.0 + np.sqrt(5.0)) / 2.0
    theta = 2.0 * np.pi * i / golden
    y = 1.0 - (2.0 * i + 1.0) / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    pts = np.stack([r * np.cos(theta), y, r * np.sin(theta)], axis=1)
    return pts.astype(np.float32)


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center a single [N, 3] cloud on its centroid and scale the furthest
    point to radius 1 (reference `model.py:46-52`)."""
    pc = np.asarray(pc, np.float32)
    pc = pc - pc.mean(axis=0, keepdims=True)
    m = np.sqrt((pc ** 2).sum(axis=1)).max()
    return pc / m


def sphere_template(n: int, path: Optional[str] = None) -> np.ndarray:
    """[n, 3] float32 normalized sphere template.

    With `path`, loads the first 3 columns of an `.xyz` file (the reference's
    `template/balls/%d.xyz` format) and `pc_normalize`s it — byte-compatible
    with `model.py:159-160`. Without, returns the deterministic fibonacci
    lattice (normalized the same way).
    """
    if path is not None:
        from sp_gan_tpu.native import parse_xyz
        ball = parse_xyz(path)[:, :3]
        if ball.shape[0] < n:
            raise ValueError(
                f"template {path} has {ball.shape[0]} points < requested {n}")
        return pc_normalize(ball[:n])
    return pc_normalize(fibonacci_sphere(n))


def sphere_sqdist(ball: np.ndarray) -> np.ndarray:
    """[N, N] squared pairwise distances of the template — the reference
    precomputes this once for the `--n_mix` region sampler
    (`model.py:162-167`)."""
    ball = np.asarray(ball, np.float32)
    sq = (ball ** 2).sum(axis=1)
    d = sq[:, None] - 2.0 * ball @ ball.T + sq[None, :]
    return np.maximum(d, 0.0)
