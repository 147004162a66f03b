"""Approximate (candidate-pruned) kNN selection for large-N training.

The reference's EdgeConv neighbor selection is an exact all-pairs scan
(`/root/reference/Generation/modules.py:694-703`) — O(N^2) per forward and
the dominant training cost at N >= 8192. This module provides two opt-in
pruned selections that exploit the structure of THIS architecture: the
second EdgeConv's feature space is smooth over the static sphere template
(EdgeConv1 input is the template itself; z is broadcast per cloud), so
feature-space neighbors are overwhelmingly template neighbors — and the
fibonacci template's spiral ordering makes template neighbors *index*
neighbors.

  knn_indices_window      banded selection: keys are a circular index
                          window around each query block. Contiguous
                          slices + dense block matmuls — no gathers at
                          all; the TPU-native choice.
  knn_indices_candidates  general candidate-set selection (static [N, C]
                          candidate lists, e.g. template kNN) — one
                          [B, N, C, F] gather; used to validate the
                          locality hypothesis and for non-fibonacci
                          templates (`--template` .xyz files have no
                          index locality — build candidates instead).

Both keep the exact contract's semantics otherwise: squared-L2 distances,
self excluded, ascending, f32 selection. Exact selection remains the
default parity contract (`Config.knn_mode = "exact"`); enable with
`--knn_mode approx`. Measured recall/quality/throughput:
`runs/probe_approx_knn.jsonl`, BASELINE.md r5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def template_candidates(template, C: int):
    """Static candidate lists from the training template: each point's C
    nearest TEMPLATE neighbors (exact, self excluded). [N, 3] -> [N, C]
    int32. One-time cost; the result is a run constant."""
    from sp_gan_tpu.ops.pairwise import knn_indices
    return jnp.asarray(
        knn_indices(jnp.asarray(template)[None], C)[0], jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_indices_candidates(x: jax.Array, k: int, cand: jax.Array,
                           block: int = 512) -> jax.Array:
    """k nearest among per-point candidate sets.

    Args:
      x: [B, N, F] features. Selection runs in f32 (like the exact path).
      cand: [N, C] int candidate indices (C >= k).
      block: query rows per chunk (bounds the [B, block, C, F] gather).
    Returns: [B, N, k] int32, ascending by distance.
    """
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    B, N, F = x.shape
    C = cand.shape[1]
    assert C >= k and N % block == 0, (N, C, k, block)

    def one_block(b0):
        rows = jax.lax.dynamic_slice(cand, (b0, 0), (block, C))  # [Q, C]
        xq = jax.lax.dynamic_slice(x, (0, b0, 0), (B, block, F))
        feats = jnp.take(x, rows.reshape(-1), axis=1).reshape(B, block, C, F)
        d = (jnp.sum(xq ** 2, -1)[..., None]
             - 2.0 * jnp.einsum("bqf,bqcf->bqc", xq, feats,
                                precision=jax.lax.Precision.HIGHEST)
             + jnp.sum(feats ** 2, -1))                          # [B, Q, C]
        _, sel = jax.lax.top_k(-d, k)                            # [B, Q, k]
        return jnp.take_along_axis(
            jnp.broadcast_to(rows[None], (B, block, C)), sel, axis=2)

    blocks = jax.lax.map(one_block, jnp.arange(0, N, block))
    return blocks.transpose(1, 0, 2, 3).reshape(B, N, k).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "window", "block"))
def knn_indices_window(x: jax.Array, k: int, window: int = 256,
                       block: int = 256) -> jax.Array:
    """k nearest within a circular index window around each query.

    Sound when index order tracks spatial order (the fibonacci template's
    spiral — template neighbors sit at near-constant index offsets well
    inside +-window). Keys for a query block are one contiguous slice of a
    wrap-padded copy: no gathers, one [Q, Q+2W] x [F] matmul per block.
    The candidate set is EXACTLY the circular +-window band per query
    (positions outside it are masked), so results are independent of the
    block size — the same contract as the fused TPU kernel
    (`ops.pallas.knn.knn_edge_window_pallas`).

    Args:
      x: [B, N, F]; k: neighbors; window: one-sided index radius W;
      block: query rows per chunk.
    Returns: [B, N, k] int32.
    """
    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    B, N, F = x.shape
    W = int(window)
    block = int(block)
    while N % block:                 # any N: shrink the query chunk, not
        block //= 2                  # the contract (band is block-size
    assert block >= 1, (N, block)    # independent)
    # 2W >= N would wrap the circular band onto itself: the same global
    # point appears at two unmasked key positions -> duplicate neighbors
    assert 2 * W < N, (N, W)
    Wtot = block + 2 * W
    xp = jnp.concatenate([x[:, -W:], x, x[:, :W]], axis=1)  # [B, N+2W, F]
    qpos = jnp.arange(block)

    def one_block(b0):
        xq = jax.lax.dynamic_slice(x, (0, b0, 0), (B, block, F))
        keys = jax.lax.dynamic_slice(xp, (0, b0, 0), (B, Wtot, F))
        # HIGHEST precision: distances feed an argsort — bf16 MXU rounding
        # (the TPU default) flips near-tie neighbors vs the f32 kernels
        d = (jnp.sum(xq ** 2, -1)[..., None]
             - 2.0 * jnp.einsum("bqf,bkf->bqk", xq, keys,
                                precision=jax.lax.Precision.HIGHEST)
             + jnp.sum(keys ** 2, -1)[:, None, :])               # [B, Q, Wtot]
        # exact band + self-exclusion: query i sits at local key position
        # W + i; keep only 0 < |pos - (W + i)| <= W
        off = jnp.arange(Wtot)[None, :] - (qpos + W)[:, None]
        d = d + jnp.where((off == 0) | (jnp.abs(off) > W),
                          jnp.inf, 0.0)[None]
        _, sel = jax.lax.top_k(-d, k)                            # [B, Q, k]
        return (b0 - W + sel) % N                                # global ids

    blocks = jax.lax.map(one_block, jnp.arange(0, N, block))
    return blocks.transpose(1, 0, 2, 3).reshape(B, N, k).astype(jnp.int32)
