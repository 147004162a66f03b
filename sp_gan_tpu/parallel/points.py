"""Point-axis sharding — the point-cloud analog of sequence/context
parallelism (SURVEY.md §5 "long-context"): shard the N points of each cloud
across a `points` mesh axis so the O(N^2) graph ops scale past one chip's
memory for high-resolution clouds (BASELINE.json configs[4], 8192+ points).

The reference has no equivalent (it scales N only via template files and the
O(n)-memory EMD). Here each shard computes kNN/edge features for its local
query slice against the all-gathered key set: the all-gather of [B, N, C]
rides ICI once per layer, while the [N_local, N] distance work and the
[B, N_local, k, 2C] activations stay shard-local — an N_shards-fold memory
reduction on the quadratic and edge tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


def knn_pointsharded(x: jax.Array, k: int, mesh: Mesh,
                     axis: str = "points") -> jax.Array:
    """Self-kNN over a point-sharded cloud.

    x: [B, N, C] sharded along N over `axis`. Returns idx [B, N, k] (global
    indices, same sharding), self excluded.
    """

    def local(x_local):
        nshards = lax.axis_size(axis)
        shard = lax.axis_index(axis)
        n_local = x_local.shape[1]
        x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)  # [B,N,C]
        d = pairwise_sqdist(x_local, x_full)          # [B, n_local, N]
        rows = shard * n_local + jnp.arange(n_local)
        cols = jnp.arange(x_full.shape[1])
        self_mask = rows[:, None] == cols[None, :]
        d = jnp.where(self_mask[None], jnp.inf, d)
        _, idx = lax.top_k(-d, k)
        return idx.astype(jnp.int32)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)


def edge_features_pointsharded(x: jax.Array, k: int, mesh: Mesh,
                               axis: str = "points") -> jax.Array:
    """Edge features [B, N, k, 2C] with N sharded: local queries vs gathered
    keys; the quadratic distance block and the edge tensor are shard-local."""

    def local(x_local):
        nshards = lax.axis_size(axis)
        shard = lax.axis_index(axis)
        B, n_local, C = x_local.shape
        x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)
        d = pairwise_sqdist(x_local, x_full)
        rows = shard * n_local + jnp.arange(n_local)
        cols = jnp.arange(x_full.shape[1])
        d = jnp.where((rows[:, None] == cols[None, :])[None], jnp.inf, d)
        _, idx = lax.top_k(-d, k)                       # [B, n_local, k]
        flat = idx.reshape(B, n_local * k)
        nbrs = jnp.take_along_axis(x_full, flat[..., None], axis=1)
        nbrs = nbrs.reshape(B, n_local, k, C)
        central = jnp.broadcast_to(x_local[:, :, None, :], nbrs.shape)
        return jnp.concatenate([central, nbrs - central], axis=-1)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None, None),
    )(x)


def edge_diff_local(x_local: jax.Array, k: int,
                    axis: str = "points") -> jax.Array:
    """Shard-local diff-only edge features for use INSIDE an enclosing
    `shard_map` (the point-sharded train step): local queries against the
    all-gathered key set, returning `nbr - central` [B, n_local, k, C] with
    global self-exclusion. The all-gather of [B, N, C] rides ICI once; the
    [B, n_local, N] distance block and the edge tensor stay shard-local.

    kNN selection is piecewise-constant, so the index computation runs under
    stop_gradient and the gather's autodiff handles d_nbr scattering (through
    the all_gather's psum-scatter VJP — neighbor gradients flow back to the
    owning shard, exactly the semantics of the unsharded op)."""
    B, n_local, C = x_local.shape
    x_full = lax.all_gather(x_local, axis, axis=1, tiled=True)    # [B, N, C]
    shard = lax.axis_index(axis)
    xq = lax.stop_gradient(x_local)
    xk = lax.stop_gradient(x_full)
    d = pairwise_sqdist(xq.astype(jnp.float32), xk.astype(jnp.float32))
    rows = shard * n_local + jnp.arange(n_local)
    cols = jnp.arange(x_full.shape[1])
    d = jnp.where((rows[:, None] == cols[None, :])[None], jnp.inf, d)
    _, idx = lax.top_k(-d, k)                                     # [B,nl,k]
    idx = lax.stop_gradient(idx)
    flat = idx.reshape(B, n_local * k)
    nbrs = jnp.take_along_axis(x_full, flat[..., None], axis=1)
    nbrs = nbrs.reshape(B, n_local, k, C)
    return nbrs - x_local[:, :, None, :]


def emd_auction_local(x_local: jax.Array, y_local: jax.Array,
                      eps: float = 0.005, iters: int = 50,
                      axis: str = "points",
                      phases: Optional[int] = None,
                      theta: float = 8.0) -> Tuple[jax.Array, jax.Array]:
    """Point-sharded EMD auction for use INSIDE an enclosing `shard_map`
    (companion to `edge_diff_local`): both clouds sharded along their point
    axis over `axis`. Returns (dist [B, n_local] squared, assignment
    [B, n_local] GLOBAL ids into cloud 2), both row-sharded like the inputs.

    TPU-native decomposition of the auction solver (`ops/emd.py`): each shard
    keeps its [B, N/P, M] distance tile (the quadratic — the VMEM/HBM ceiling
    of the single-chip solver — is divided by the points-mesh size), while
    the O(M) price vector and item-owner table are replicated. One Jacobi
    round = shard-local best/second-bid reductions + an all_gather of the
    per-shard (max bid, bidder) partials per item, which rides ICI. The
    per-shard argmax then argmax-over-shards resolution picks the lowest
    global row index among tied bids — exactly the unsharded
    `jnp.argmax(bid_mat, axis=0)` tie-break, so the sharded solver is
    round-for-round identical to `emd_auction(..., scaled=True)`'s XLA path
    (equivalence-tested on the virtual mesh).

    `iters` caps TOTAL rounds (matching `_auction_single_scaled`); leftover
    rows after the cap take their current best item (the CUDA forced pass,
    `emd_cuda.cu` Assign last=true). Default phases heuristic matches
    `ops/emd.py::_emd_forward`: single phase at the target eps for small caps
    (train-regime CutMix/GP), 4 eps-scaling phases otherwise. Gradients flow
    to `x_local` only (reference `emd_module.py:66-72`)."""
    B, n_local, _ = x_local.shape
    if phases is None:
        phases = 1 if iters <= 500 else 4
    shard = lax.axis_index(axis)
    row_base = shard * n_local
    y_full = lax.all_gather(lax.stop_gradient(y_local), axis,
                            axis=1, tiled=True)               # [B, M, 3]
    M = y_full.shape[1]
    N = n_local * lax.axis_size(axis)
    d = pairwise_sqdist(lax.stop_gradient(x_local), y_full)   # [B, nl, M]
    arange_m = jnp.arange(M, dtype=jnp.int32)
    arange_b = jnp.arange(B)[:, None]

    def make_round(eps_p):
        def round_fn(state):
            it, _, assignment, assignment_inv, price = state
            unassigned = assignment < 0                       # [B, nl]
            value = -d - price[:, None, :]                    # [B, nl, M]
            best_val = jnp.max(value, axis=-1)
            best_idx = jnp.argmax(value, axis=-1).astype(jnp.int32)
            masked = jnp.where(
                arange_m[None, None, :] == best_idx[..., None],
                -jnp.inf, value)
            second_val = jnp.max(masked, axis=-1)
            bid_inc = best_val - second_val + eps_p           # [B, nl]

            bids_on = unassigned[..., None] & (
                best_idx[..., None] == arange_m[None, None, :])
            bid_mat = jnp.where(bids_on, bid_inc[..., None], -jnp.inf)
            part_bid = jnp.max(bid_mat, axis=1)               # [B, M]
            part_row = row_base + jnp.argmax(bid_mat, axis=1).astype(
                jnp.int32)                                    # [B, M]
            all_bids = lax.all_gather(part_bid, axis)         # [P, B, M]
            all_rows = lax.all_gather(part_row, axis)         # [P, B, M]
            src = jnp.argmax(all_bids, axis=0)                # [B, M]
            max_bid = jnp.max(all_bids, axis=0)
            winner = jnp.take_along_axis(all_rows, src[None], axis=0)[0]
            has_bid = jnp.isfinite(max_bid)                   # [B, M]

            # evict previous owners (rows living on this shard), then
            # install winners — same order as the unsharded round
            prev = assignment_inv                             # [B, M] global
            mine_prev = has_bid & (prev >= row_base) & (prev < row_base
                                                        + n_local)
            evict_local = jnp.where(mine_prev, prev - row_base, n_local)
            assignment = assignment.at[arange_b, evict_local].set(
                -1, mode="drop")
            mine_win = has_bid & (winner >= row_base) & (winner < row_base
                                                         + n_local)
            win_local = jnp.where(mine_win, winner - row_base, n_local)
            item = jnp.broadcast_to(arange_m[None, :], (B, M))
            assignment = assignment.at[arange_b, win_local].set(
                item, mode="drop")
            assignment_inv = jnp.where(has_bid, winner, assignment_inv)
            price = price + jnp.where(has_bid, max_bid, 0.0)
            n_un = lax.psum(jnp.sum(assignment < 0), axis)
            return it + 1, n_un, assignment, assignment_inv, price
        return round_fn

    it = jnp.int32(0)
    price = jnp.zeros((B, M), d.dtype)
    assignment = jnp.full((B, n_local), -1, jnp.int32)
    assignment_inv = jnp.full((B, M), -1, jnp.int32)
    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        assignment = jnp.full((B, n_local), -1, jnp.int32)
        assignment_inv = jnp.full((B, M), -1, jnp.int32)
        it, _, assignment, assignment_inv, price = lax.while_loop(
            lambda s: (s[0] < iters) & (s[1] > 0),
            make_round(eps_p),
            (it, jnp.int32(B * N), assignment, assignment_inv, price))

    value = -d - price[:, None, :]
    best_idx = jnp.argmax(value, axis=-1).astype(jnp.int32)
    assignment = jnp.where(assignment < 0, best_idx, assignment)
    matched = jnp.take_along_axis(y_full, assignment[..., None], axis=1)
    dist = jnp.sum((x_local - matched) ** 2, axis=-1)
    return dist, assignment


def global_max_points(x_local: jax.Array, axis: str = "points") -> jax.Array:
    """Differentiable max over the sharded point axis: local max, all_gather
    the per-shard maxima, max again. [B, n_local, C] -> [B, C] replicated.
    (The gather keeps the reduction differentiable — gradients route to the
    arg-max owner shard through the gather's VJP; `lax.pmax` has no VJP.)"""
    g_local = jnp.max(x_local, axis=1)                            # [B, C]
    gathered = lax.all_gather(g_local, axis)                      # [P, B, C]
    return jnp.max(gathered, axis=0)


def chamfer_pointsharded(x: jax.Array, y: jax.Array, mesh: Mesh,
                         axis: str = "points") -> Tuple[jax.Array, jax.Array]:
    """Directed Chamfer minima with both clouds point-sharded: each shard
    reduces its local x block against the gathered y, and the y-side minima
    are combined with a psum-of-min trick (min = -pmax(-x))."""

    def local(x_local, y_local):
        y_full = lax.all_gather(y_local, axis, axis=1, tiled=True)
        d = pairwise_sqdist(x_local, y_full)            # [B, nx_local, M]
        d1_local = jnp.min(d, axis=-1)                  # [B, nx_local]
        # y-side minima over all x shards: combine via global min
        d2_partial = jnp.min(d, axis=-2)                # [B, M]
        d2_full = -lax.pmax(-d2_partial, axis)          # [B, M] replicated
        n_local = y_local.shape[1]
        shard = lax.axis_index(axis)
        d2_local = lax.dynamic_slice_in_dim(d2_full, shard * n_local,
                                            n_local, axis=1)
        return d1_local, d2_local

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
    )(x, y)


def pairwise_emd_matrix_pointsharded(gen: jax.Array, ref: jax.Array,
                                     mesh: Mesh, eps: float = 0.005,
                                     iters: int = 50,
                                     row_batch: int = 8,
                                     axis: str = "points"):
    """Point-sharded metric-protocol EMD matrix: [S1,N,3] x [S2,N,3] ->
    [S1,S2] mean L2 matching cost (the lgan protocol of
    `eval.metrics.pairwise_emd_matrix`; reference `_pairwise_EMD_CD_`,
    loss_utils.py:311-340), with every auction solve's quadratic [N, N]
    distance tile sharded over the mesh's point axis.

    This lifts the single-chip memory ceiling of the EMD protocol: each
    shard holds [S2, N/P, N] distances per row solve, so an 8-way points
    mesh evaluates N=16384 protocols with the per-chip footprint of
    N=2048. The solver is `emd_auction_local` — round-for-round identical
    to the single-chip scaled auction given bitwise-identical distance
    tiles (the direct-solve equivalence test in test_points_sharding.py).
    Across the two protocol wrappers XLA may fuse the distance matmul
    differently (ulp-level), which can flip a near-tie bid; both results
    then satisfy the same N*eps optimality contract, so matrix entries
    agree to ~eps rather than bitwise.
    """
    S1 = gen.shape[0]
    N = gen.shape[1]
    n_shards = mesh.devices.size if axis not in mesh.axis_names else \
        dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    assert N % n_shards == 0, (N, n_shards)

    @jax.jit
    def rows(g_block):                                    # [R, N, 3]
        def local(g_l, ref_l):                            # [R,nl,3],[S2,nl,3]
            def one(cloud_l):                             # [nl, 3]
                d, _ = emd_auction_local(
                    jnp.broadcast_to(cloud_l[None], ref_l.shape), ref_l,
                    eps, iters, axis=axis)                # [S2, nl]
                s = lax.psum(jnp.sum(jnp.sqrt(jnp.maximum(d, 0.0)), -1),
                             axis)
                return s / N                              # [S2]
            return lax.map(one, g_l)                      # [R, S2]

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None)),
            out_specs=P(None, None),
            check_vma=False,
        )(g_block, ref)

    out = []
    for lo in range(0, S1, row_batch):
        out.append(np.asarray(rows(gen[lo:lo + row_batch])))
    return np.concatenate(out, axis=0)
