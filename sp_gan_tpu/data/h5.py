"""Dataset layer — rebuild of the reference's H5 pipeline
(`/root/reference/Generation/H5DataLoader.py`), host-side numpy only.

The reference wraps a torch `Dataset` in a multi-worker `DataLoader`
(`Generation/model.py:211-212`); here the whole (small) dataset is a resident
numpy array and batches are assembled by the native C++ gather+shuffle
(`sp_gan_tpu/native`) or handed wholesale to the trainer's on-device path,
which keeps the entire dataset in HBM and moves only a [bs] index vector per
step.

Layout matches the reference exactly: `{data_root}/{n_points}/{choice}.h5`
with dataset key `poisson_{n_points}` (`H5DataLoader.py:14-17,98-100`), unit
-sphere normalization x `scale` (`:103`), multi-class concatenation for
`--con` (chair/table/bench[:cls], `:47-60`), `animal_all`
(animal-pose + animal-deform, `:74-83`) and `bottle` (bottle/jar/pot,
`:84-95`).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def load_h5(path: str, num: int = 2048) -> np.ndarray:
    """Read dataset key `poisson_{num}` from an .h5 file
    (`H5DataLoader.py:14-17`)."""
    import h5py
    with h5py.File(path, "r") as f:
        return np.asarray(f[f"poisson_{num}"][:], np.float32)


def _normalize_np(pc: np.ndarray) -> np.ndarray:
    """Batched numpy unit-sphere normalization
    (`Common/point_operation.py:21-40`)."""
    pc = np.asarray(pc, np.float32)
    centroid = pc.mean(axis=1, keepdims=True)
    pc = pc - centroid
    m = np.sqrt((pc ** 2).sum(axis=-1)).max(axis=1)
    return pc / (m[:, None, None] + 1e-12)


class _Dataset:
    """Shared host-side dataset behavior: `.data` [M, N, 3] float32,
    `.labels` (None unless multi-class), and drop-last shuffled epoch
    batches with independent per-item point shuffles
    (`H5DataLoader.__getitem__`, :111-123)."""

    data: np.ndarray
    labels: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.data)

    def epoch_batches(self, rng: np.random.Generator,
                      bs: int) -> Iterator[np.ndarray]:
        from sp_gan_tpu.native import assemble_batch
        order = rng.permutation(len(self.data))
        for lo in range(0, (len(self.data) // bs) * bs, bs):
            idx = order[lo:lo + bs].astype(np.int64)
            seed = int(rng.integers(1, np.iinfo(np.int64).max))
            yield assemble_batch(self.data, idx, seed)


class H5Dataset(_Dataset):
    def __init__(self, data_root: str, choice: str, n_points: int = 2048,
                 scale: float = 1.0, cls: int = 2, con: bool = False):
        d = os.path.join(data_root, str(n_points))
        if con:
            cats = ["chair", "table", "bench"][:cls]
            pcs, labels = [], []
            for i, cat in enumerate(cats):
                pc = _normalize_np(load_h5(
                    os.path.join(d, cat + ".h5"), n_points))
                pcs.append(pc)
                labels.append(np.full((len(pc),), i, np.int32))
            self.data = np.concatenate(pcs, axis=0)
            self.labels = np.concatenate(labels, axis=0)
        elif choice == "animal_all":
            cats = ["animal-pose", "animal-deform"]
            self.data = np.concatenate(
                [_normalize_np(load_h5(os.path.join(d, c + ".h5"), n_points))
                 for c in cats], axis=0)
        elif choice == "bottle":
            cats = ["bottle", "jar", "pot"]
            self.data = np.concatenate(
                [_normalize_np(load_h5(os.path.join(d, c + ".h5"), n_points))
                 for c in cats], axis=0)
        else:
            self.data = load_h5(
                os.path.join(d, choice.lower() + ".h5"), n_points)
        # scale x normalize applies to the concatenated set too
        # (H5DataLoader.py:103 re-normalizes after the branches)
        self.data = (scale * _normalize_np(self.data)).astype(np.float32)


class SyntheticDataset(_Dataset):
    """Deterministic synthetic shape family for tests/benchmarks when no
    ShapeNet H5 is present: ellipsoidally-scaled fibonacci spheres with a
    low-frequency radial modulation — smooth, learnable, and normalized the
    same way as real data. (No reference equivalent; the reference assumes
    ShapeNet is on disk.)"""

    def __init__(self, n_items: int = 24, n_points: int = 2048,
                 seed: int = 0):
        from sp_gan_tpu.data.sphere import fibonacci_sphere
        rng = np.random.default_rng(seed)
        base = fibonacci_sphere(n_points)                    # [N, 3]
        azim = np.arctan2(base[:, 2], base[:, 0])            # [N]
        items = []
        for _ in range(n_items):
            axes = rng.uniform(0.45, 1.0, size=(3,))
            freq = rng.integers(1, 4)
            phase = rng.uniform(0.0, 2.0 * np.pi)
            amp = rng.uniform(0.05, 0.2)
            radial = 1.0 + amp * np.sin(freq * azim + phase)
            items.append(base * axes[None, :] * radial[:, None])
        self.data = _normalize_np(np.stack(items).astype(np.float32))


class SyntheticMultiClassDataset(_Dataset):
    """Multi-class synthetic family: the `--con` analog of SyntheticDataset
    when no ShapeNet H5 is present. Three geometrically distinct classes
    (the reference's --con concatenates chair/table/bench and trains
    unconditionally on the mix, H5DataLoader.py:47-60 — labels are produced
    but never consumed by its training loop, model.py:244-246):

      0: modulated ellipsoids  (the SyntheticDataset family)
      1: tori                  (distinct topology: genus 1)
      2: superellipsoid boxes  (flat faces / rounded edges)

    `.labels` carries the class ids for per-class evaluation."""

    def __init__(self, n_items: int = 24, n_points: int = 2048,
                 seed: int = 0, n_classes: int = 3):
        from sp_gan_tpu.data.sphere import fibonacci_sphere
        assert 1 <= n_classes <= 3
        rng = np.random.default_rng(seed)
        base = fibonacci_sphere(n_points)                    # [N, 3]
        azim = np.arctan2(base[:, 2], base[:, 0])            # [N]
        golden = (1.0 + np.sqrt(5.0)) / 2.0
        i = np.arange(n_points)
        # low-discrepancy torus parameterization (deterministic, like the
        # fibonacci sphere): minor angle dense, major angle golden-stepped
        t_theta = 2.0 * np.pi * ((i * golden) % 1.0)         # minor
        t_phi = 2.0 * np.pi * i / n_points                   # major

        items, labels = [], []
        for j in range(n_items):
            c = j % n_classes
            axes = rng.uniform(0.45, 1.0, size=(3,))
            if c == 0:
                freq = rng.integers(1, 4)
                phase = rng.uniform(0.0, 2.0 * np.pi)
                amp = rng.uniform(0.05, 0.2)
                radial = 1.0 + amp * np.sin(freq * azim + phase)
                pc = base * axes[None, :] * radial[:, None]
            elif c == 1:
                ratio = rng.uniform(0.25, 0.45)              # r/R
                R, r = 1.0, float(ratio)
                ring = R + r * np.cos(t_theta)
                pc = np.stack([ring * np.cos(t_phi),
                               r * np.sin(t_theta),
                               ring * np.sin(t_phi)], axis=1) * axes[None, :]
            else:
                e = rng.uniform(0.25, 0.5)                   # boxiness
                pc = np.sign(base) * np.abs(base) ** e * axes[None, :]
            items.append(pc)
            labels.append(c)
        self.data = _normalize_np(np.stack(items).astype(np.float32))
        self.labels = np.asarray(labels, np.int32)
