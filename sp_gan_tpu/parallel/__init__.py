"""Device-mesh + sharding layer.

The reference's entire parallelism surface is single-process
`nn.DataParallel` (`/root/reference/Generation/model.py:79-84`): batch
scatter, per-step weight broadcast, output gather. TPU-native equivalent:
a `jax.sharding.Mesh` with the batch dim sharded over the `data` axis and
parameters replicated; XLA GSPMD inserts the gradient all-reduce over ICI.
No process groups, no communication backend to bootstrap.
"""

from sp_gan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]
