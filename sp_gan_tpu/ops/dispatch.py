"""Kernel dispatch: Pallas on TPU, XLA elsewhere.

Each hot op has two implementations (SURVEY.md §7 layer 1: "`_xla` reference
implementation and a `_pallas` tiled implementation behind one dispatch").
Selection happens at trace time from the active backend; `SPGAN_NO_PALLAS=1`
forces the XLA path everywhere (debugging / regression triage).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax


def pallas_enabled() -> bool:
    if os.environ.get("SPGAN_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def knn(x: jax.Array, k: int) -> jax.Array:
    """Self-kNN indices [B,N,k] (self excluded), fastest available impl.

    Wrapped in a zero-gradient custom VJP: neighbor *selection* is piecewise
    constant (the reference likewise treats indices as data), and the wrapper
    keeps autodiff from trying to trace through the Pallas kernel.
    """
    if pallas_enabled():
        from sp_gan_tpu.ops.pallas.knn import knn_pallas
        return knn_pallas(x, k)[0]
    from sp_gan_tpu.ops.pairwise import knn_indices
    return knn_indices(x, k, exclude_self=True)


def _knn_fwd(x, k):
    return knn(x, k), x


def _knn_bwd(k, x, g):
    import jax.numpy as jnp
    return (jnp.zeros_like(x),)


knn.defvjp(_knn_fwd, _knn_bwd)


def chamfer_directed(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(dist1 [B,N], dist2 [B,M]) squared NN distances both ways.

    The Pallas kernel avoids materializing [B,N,M] in HBM; measured on
    TPU v5e it only wins once that matrix is large (dense XLA: 0.028ms,
    Pallas: 0.049ms at B=24 N=M=2048 — the revisited-output accumulation
    serializes the grid), so it dispatches on size.
    """
    B, N, _ = x.shape
    M = y.shape[1]
    if pallas_enabled() and B * N * M > 512 * 1024 * 1024 // 4:
        from sp_gan_tpu.ops.pallas.chamfer import chamfer_pallas
        return chamfer_pallas(x, y)
    import jax.numpy as jnp
    from sp_gan_tpu.ops.pairwise import pairwise_sqdist
    d = pairwise_sqdist(x, y)
    return jnp.min(d, axis=-1), jnp.min(d, axis=-2)
