"""Mesh construction and sharding specs.

Data-parallel GAN training (the reference's DataParallel equivalent,
SURVEY.md §2.4): batch axis sharded over `data`, parameters/optimizer state
replicated; XLA emits `all-reduce` for gradients over ICI. A second mesh axis
`points` is reserved for sharding the point dimension of the O(N^2) graph ops
(the point-cloud analog of sequence parallelism) for high-resolution configs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (1,),
              axes: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    n = int(np.prod(shape))
    devs = list(devices) if devices is not None else jax.devices()[:n]
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    dev_array = np.asarray(devs[:n]).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 3, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim))
