"""Edge-feature construction for graph convolutions.

Replaces `get_edge_features` / `get_edge_features_xyz`
(`/root/reference/Generation/modules.py:683-776`). The reference gathers
neighbors with a *Python loop over the batch* of `index_select` calls; here the
gather is a single batched `take_along_axis`, which XLA lowers to one fused
gather — no host round-trips, no loop.

Layout note: this framework is channel-last ([B, N, C]); the reference is
channel-first ([B, C, N]). Edge features come back as [B, N, k, 2C] with the
same content split: [..., :C] = central point, [..., C:] = neighbor - central.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sp_gan_tpu.ops.pairwise import knn_indices


def _gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, C = x.shape
    k = idx.shape[-1]
    flat = idx.reshape(B, N * k)                              # [B, N*k]
    gathered = jnp.take_along_axis(x, flat[..., None], axis=1)  # [B, N*k, C]
    return gathered.reshape(B, N, k, C)


@jax.custom_vjp
def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-point neighbor features.

    Args:
      x: [B, N, C]
      idx: [B, N, k] int indices into the N axis.
    Returns:
      [B, N, k, C]

    Custom VJP: the natural backward is a scatter-add of [B,N,k,C] into
    [B,N,C], which TPUs execute poorly for the clustered duplicate targets a
    kNN graph produces (measured ~12ms vs ~1.5ms for uniform indices at
    B=24 N=2048 k=10 C=64 on v5e). We instead transpose the gather as a
    one-hot contraction on the MXU: dx[b,n,:] = sum_{s: idx[b,s]=n} g[b,s,:].
    """
    return _gather(x, idx)


def _gather_fwd(x, idx):
    return _gather(x, idx), (x, idx)


def _gather_bwd(res, g):
    x, idx = res
    B, N, C = x.shape
    k = idx.shape[-1]
    flat = idx.reshape(B, N * k)
    gf = g.reshape(B, N * k, C)
    # one-hot contraction (entries exact in bf16; f32 accumulation). Beats
    # both TPU scatter (serializes on clustered kNN duplicates) and a pallas
    # scatter-matmul kernel at training sizes (measured 53.9 vs 55.4 ms/step).
    if B * N * k * N * g.dtype.itemsize <= (1 << 30):
        onehot = jax.nn.one_hot(flat, N, dtype=g.dtype, axis=-1)  # [B,Nk,N]
        return jnp.einsum("bsn,bsc->bnc", onehot, gf), None
    # large case: the one-hot would exceed ~1GB; use the VMEM-tiled pallas
    # scatter-matmul (TPU) or a lax.map-tiled one-hot (CPU).
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    if pallas_enabled():
        from sp_gan_tpu.ops.pallas.scatter import scatter_add_pallas
        return scatter_add_pallas(gf, flat, N).astype(x.dtype), None
    T = 256
    while N % T:
        T //= 2

    def chunk(t0):
        cols = t0 + jnp.arange(T)
        oh = (flat[..., None] == cols[None, None, :]).astype(g.dtype)
        return jnp.einsum("bst,bsc->btc", oh, gf)      # [B, T, C]

    parts = jax.lax.map(chunk, jnp.arange(0, N, T))    # [N/T, B, T, C]
    return parts.transpose(1, 0, 2, 3).reshape(B, N, C), None


gather_neighbors.defvjp(_gather_fwd, _gather_bwd)


def edge_features(
    x: jax.Array,
    k: int,
    idx: Optional[jax.Array] = None,
    return_idx: bool = False,
):
    """[B, N, C] -> [B, N, k, 2C] edge features: concat[central, nbr - central].

    Mirrors reference `get_edge_features` (`modules.py:683-725`) including
    self-exclusion from the kNN set.
    """
    if idx is None:
        from sp_gan_tpu.ops.dispatch import knn as knn_dispatch
        idx = knn_dispatch(x, k)
    nbrs = gather_neighbors(x, idx)                            # [B, N, k, C]
    central = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)   # [B, N, k, C]
    ee = jnp.concatenate([central, nbrs - central], axis=-1)   # [B, N, k, 2C]
    if return_idx:
        return ee, idx
    return ee


def edge_features_xyz(
    x: jax.Array,
    pc: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Feature-space kNN with an additional xyz gather on the same indices.

    Mirrors reference `get_edge_features_xyz` (`modules.py:727-776`).
    Returns (e_fea [B,N,k,2C], e_xyz [B,N,k,6]).
    """
    idx = knn_indices(x, k, exclude_self=True)
    nbrs = gather_neighbors(x, idx)
    xyz = gather_neighbors(pc, idx)
    central = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
    central_xyz = jnp.broadcast_to(pc[:, :, None, :], xyz.shape)
    e_fea = jnp.concatenate([central, nbrs - central], axis=-1)
    e_xyz = jnp.concatenate([central_xyz, xyz - central_xyz], axis=-1)
    return e_fea, e_xyz
