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

import functools
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


def scatter_rows(g: jax.Array, idx: jax.Array, N: int,
                 out_dtype=None) -> jax.Array:
    """Transposed gather: out[b, n] = sum_{s: idx[b,s]=n} g[b, s].

    g: [B, S, C], idx: [B, S] int -> [B, N, C]. One-hot contraction (entries
    exact in bf16; f32 accumulation) — beats TPU scatter, which serializes on
    the clustered duplicate targets a kNN graph produces; VMEM-tiled pallas
    scatter-matmul above the ~1GB one-hot size."""
    B, S, C = g.shape
    out_dtype = out_dtype or g.dtype
    if B * S * N * g.dtype.itemsize <= (1 << 30):
        onehot = jax.nn.one_hot(idx, N, dtype=g.dtype, axis=-1)  # [B,S,N]
        return jnp.einsum("bsn,bsc->bnc", onehot, g).astype(out_dtype)
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    if pallas_enabled():
        from sp_gan_tpu.ops.pallas.scatter import scatter_add_pallas
        return scatter_add_pallas(g, idx, N).astype(out_dtype)
    T = 256
    while N % T:
        T //= 2

    def chunk(t0):
        cols = t0 + jnp.arange(T)
        oh = (idx[..., None] == cols[None, None, :]).astype(g.dtype)
        return jnp.einsum("bst,bsc->btc", oh, g)       # [B, T, C]

    parts = jax.lax.map(chunk, jnp.arange(0, N, T))    # [N/T, B, T, C]
    return parts.transpose(1, 0, 2, 3).reshape(B, N, C).astype(out_dtype)


def _gather_bwd(res, g):
    x, idx = res
    B, N, C = x.shape
    k = idx.shape[-1]
    return scatter_rows(g.reshape(B, N * k, C), idx.reshape(B, N * k),
                        N, out_dtype=x.dtype), None


gather_neighbors.defvjp(_gather_fwd, _gather_bwd)


# ------------------------------------------------------------------
# Fused kNN + gather + edge features (TPU): one Pallas sweep emits the edge
# tensor straight from the distance tiles — no [B,N,k,C] XLA gather (which
# runs at ~2% HBM bandwidth) and no idx round trip. VERDICT r1 #2.
def _use_fused_knn_edge(x: jax.Array) -> bool:
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    B, N, C = x.shape
    return (pallas_enabled() and N % 8 == 0
            and N <= 8192                # dense [TQ, N] dist tiles in VMEM
            and N * C * 4 <= (8 << 20)   # keys block must sit in VMEM
            and C >= 16)                 # tiny-C tensors are faster in XLA


def _knn_modes():
    """Probe knobs for the fused kernel's distance precision and selection
    strategy (A/B'd via full-program step rates — see BASELINE.md r3):
    SPGAN_DIST_MODE in {highest, bf16_3x}, SPGAN_KNN_SELECT in
    {packed, exact}. Read at trace time.

    Defaults from the r3 A/B (24-iter chunked runs, bs=24 N=2048):
    packed 39.3 vs exact 38.8 steps/s (single int-min reduce per selection
    round); bf16_3x 38.0 — the 3-pass distance matmul is NOT a win over
    6-pass HIGHEST (confirms the r2 negative with full-program numbers)."""
    import os
    return (os.environ.get("SPGAN_DIST_MODE", "highest"),
            os.environ.get("SPGAN_KNN_SELECT", "packed"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _knn_edge(x: jax.Array, k: int, out_dtype):
    from sp_gan_tpu.ops.pallas.knn import knn_edge_pallas
    dist_mode, select_mode = _knn_modes()
    return knn_edge_pallas(x, k, out_dtype, dist_mode=dist_mode,
                           select_mode=select_mode)


def _knn_edge_fwd(x, k, out_dtype):
    ee, idx = _knn_edge(x, k, out_dtype)
    # residuals must be jax types: a size-0 probe carries x's shape/dtype
    return (ee, idx), (idx, jnp.zeros((0,) + x.shape, x.dtype))


def _knn_edge_bwd(k, out_dtype, res, g):
    idx, probe = res
    xshape, xdtype = probe.shape[1:], probe.dtype
    d_ee, _ = g
    B, N, C = xshape
    # ee = [central, nbr - central]: central collects sum_j(d[..., :C] -
    # d[..., C:]) at its own row; the neighbor half scatters through idx.
    # (kNN index selection itself is piecewise-constant: no gradient.)
    import os
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    if (pallas_enabled() and N % 8 == 0
            and os.environ.get("SPGAN_EDGE_BWD", "xla") == "pallas"):
        # A/B'd on v5e at bs=24/N=2048: the one-sweep kernel re-reads the
        # d_ee block once per target tile (8x) and measured 1.6 ms SLOWER
        # than the XLA slice/sub + scatter_rows path below — kept opt-in
        from sp_gan_tpu.ops.pallas.scatter import edge_scatter_bwd_pallas
        return (edge_scatter_bwd_pallas(d_ee, idx).astype(xdtype),)
    d_central = jnp.sum(d_ee[..., :C] - d_ee[..., C:], axis=2)
    d_nbr = d_ee[..., C:].reshape(B, N * k, C)
    d_x = d_central + scatter_rows(d_nbr, idx.reshape(B, N * k), N)
    return (d_x.astype(xdtype),)


_knn_edge.defvjp(_knn_edge_fwd, _knn_edge_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _knn_edge_diff(x: jax.Array, k: int, out_dtype):
    from sp_gan_tpu.ops.pallas.knn import knn_edge_pallas
    # tq=512: ~15% faster than 256 for the diff-only variant on v5e
    # (amortized 64-deep scan sweep, r2); 1024 regresses 2x (VMEM pressure)
    dist_mode, select_mode = _knn_modes()
    return knn_edge_pallas(x, k, out_dtype, tq=512, diff_only=True,
                           dist_mode=dist_mode, select_mode=select_mode)


def _knn_edge_diff_fwd(x, k, out_dtype):
    diff, idx = _knn_edge_diff(x, k, out_dtype)
    return (diff, idx), (idx, jnp.zeros((0,) + x.shape, x.dtype))


def _knn_edge_diff_bwd(k, out_dtype, res, g):
    idx, probe = res
    xshape, xdtype = probe.shape[1:], probe.dtype
    d_diff, _ = g                                      # [B, N, k, C]
    B, N, C = xshape
    # diff = nbr - central: the neighbor side scatters through idx, the
    # central side collects -sum_k at its own row. (Half the d_ee bytes of
    # the concat form — the central half lives in EdgeBlock's conv_x now.)
    import os
    from sp_gan_tpu.ops.dispatch import pallas_enabled
    if (pallas_enabled() and N % 8 == 0
            and os.environ.get("SPGAN_DIFF_BWD", "pallas") == "pallas"):
        # native-shape kernel: no N*k reshape relayouts (see
        # scatter_diff_bwd_pallas; SPGAN_DIFF_BWD=xla restores the
        # reshape + scatter_rows path below)
        from sp_gan_tpu.ops.pallas.scatter import scatter_diff_bwd_pallas
        return (scatter_diff_bwd_pallas(d_diff, idx).astype(xdtype),)
    d_x = scatter_rows(d_diff.reshape(B, N * k, C), idx.reshape(B, N * k), N)
    d_x = d_x - jnp.sum(d_diff, axis=2)
    return (d_x.astype(xdtype),)


_knn_edge_diff.defvjp(_knn_edge_diff_fwd, _knn_edge_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _knn_edge_diff_window(x: jax.Array, k: int, window: int, out_dtype):
    """Banded (`--knn_mode approx`) twin of `_knn_edge_diff`: selection
    restricted to the circular index band |i - j| <= window
    (ops/pallas/knn.py::knn_edge_window_pallas). Same backward — emitted
    indices are global, so the scatter is unchanged."""
    from sp_gan_tpu.ops.pallas.knn import knn_edge_window_pallas
    dist_mode, select_mode = _knn_modes()
    return knn_edge_window_pallas(x, k, window, out_dtype, tq=256,
                                  diff_only=True, dist_mode=dist_mode,
                                  select_mode=select_mode)


def _knn_edge_diff_window_fwd(x, k, window, out_dtype):
    diff, idx = _knn_edge_diff_window(x, k, window, out_dtype)
    return (diff, idx), (idx, jnp.zeros((0,) + x.shape, x.dtype))


def _knn_edge_diff_window_bwd(k, window, out_dtype, res, g):
    return _knn_edge_diff_bwd(k, out_dtype, res, g)


_knn_edge_diff_window.defvjp(_knn_edge_diff_window_fwd,
                             _knn_edge_diff_window_bwd)


def edge_diff_features(
    x: jax.Array,
    k: int,
    idx: Optional[jax.Array] = None,
    out_dtype=None,
    window: Optional[int] = None,
):
    """[B, N, C] -> diff-only edge features `nbr - central` [B, N, k, C].

    The [central, diff] concatenation of `edge_features` doubles the HBM
    footprint of the hot tensor for no information: central is x broadcast
    over k, and every consumer (EdgeBlock) either uses the diff half alone
    (conv_w) or can fold central into a per-point matmul (conv_x split).
    Same kNN semantics (self-excluded, ascending, f32 selection).

    `window` (with idx=None) restricts selection to the circular index
    band |i - j| <= window — the `--knn_mode approx` contract (see
    ops/approx_knn.py for when that is sound)."""
    if window is not None:
        # normalize once so the fused kernel and the XLA fallback see the
        # SAME effective band (the kernel needs 2W + tq <= N for its
        # wrap-padded key slices; W <= (N-1)//2 keeps circular bands
        # duplicate-free)
        N = x.shape[1]
        tq = 256
        while N % tq:
            tq //= 2
        window = min(int(window), (N - tq) // 2, (N - 1) // 2)
        if window < k:
            window = None          # band too small to be meaningful
    if idx is None and _use_fused_knn_edge(x):
        if window is not None:
            diff, _ = _knn_edge_diff_window(
                x, k, int(window), jnp.dtype(out_dtype or x.dtype).name)
            return diff
        diff, _ = _knn_edge_diff(x, k, jnp.dtype(out_dtype or x.dtype).name)
        return diff
    if idx is None and window is not None:
        from sp_gan_tpu.ops.approx_knn import knn_indices_window
        idx = knn_indices_window(
            jax.lax.stop_gradient(x).astype(jnp.float32), k, int(window))
    if idx is None:
        from sp_gan_tpu.ops.dispatch import knn as knn_dispatch
        idx = knn_dispatch(x, k)
    if out_dtype is not None:
        x = x.astype(out_dtype)
    nbrs = gather_neighbors(x, idx)                            # [B, N, k, C]
    return nbrs - x[:, :, None, :]


def edge_features(
    x: jax.Array,
    k: int,
    idx: Optional[jax.Array] = None,
    return_idx: bool = False,
    out_dtype=None,
):
    """[B, N, C] -> [B, N, k, 2C] edge features: concat[central, nbr - central].

    Mirrors reference `get_edge_features` (`modules.py:683-725`) including
    self-exclusion from the kNN set. With idx=None on TPU the kNN selection,
    gather and edge construction run as ONE Pallas sweep (selection always
    f32); `out_dtype` casts the edge tensor (mixed_edge passes bf16 while
    keeping f32-coordinate neighbor selection).
    """
    if idx is None and _use_fused_knn_edge(x):
        ee, idx = _knn_edge(x, k, jnp.dtype(out_dtype or x.dtype).name)
        return (ee, idx) if return_idx else ee
    if idx is None:
        from sp_gan_tpu.ops.dispatch import knn as knn_dispatch
        idx = knn_dispatch(x, k)
    if out_dtype is not None:
        x = x.astype(out_dtype)
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
