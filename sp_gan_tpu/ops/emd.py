"""Earth Mover's Distance via the auction algorithm — TPU-native replacement
for `/root/reference/metrics/emd/emd_cuda.cu` (kernels `Bid`/`GetMax`/`Assign`/
`CalcDist`) and its Python wrapper `emd_module.py`.

Contract matched to the reference:
  * inputs [B, N, 3] x2 clouds of equal size, output per-point squared
    distance [B, N] plus the assignment [B, N] into the second cloud;
  * auction with bid increment `best - second + eps`; a final forced pass
    assigns any still-unassigned point to its current best item (the CUDA
    `last=true` branch) so the result may not be a bijection;
  * gradients flow to `xyz1` only (the reference backward returns zeros for
    `xyz2` — see `emd_module.py:66-72`).

The CUDA version is a Gauss–Seidel auction over an O(n) price vector. Here we
run a *Jacobi* auction: every unassigned point bids simultaneously each round,
items accept their highest bid. Each round is a dense [N, N] value computation
— one MXU matmul plus VPU reductions — traced once inside `lax.fori_loop`, so
the whole solver is a single XLA program with static shapes. Reference
operating points (emd/README.md:7-8): train eps=0.005 iters=50, eval
eps=0.002 iters=10000.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sp_gan_tpu.ops.pairwise import pairwise_sqdist


def _auction_single(d: jax.Array, eps: float, iters: int) -> jax.Array:
    """Auction assignment for one cloud pair. d: [N, M] squared distances."""
    n, m = d.shape
    arange_n = jnp.arange(n, dtype=jnp.int32)
    arange_m = jnp.arange(m, dtype=jnp.int32)

    def round_fn(_, state):
        assignment, assignment_inv, price = state
        unassigned = assignment < 0                                   # [N]

        value = -d - price[None, :]                                   # [N, M]
        # best and second-best item per point — explicit max passes instead
        # of lax.top_k (which lowers to a sort on TPU and dominates runtime)
        best_val = jnp.max(value, axis=1)
        best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)        # [N]
        masked = jnp.where(arange_m[None, :] == best_idx[:, None],
                           -jnp.inf, value)
        second_val = jnp.max(masked, axis=1)
        bid_inc = best_val - second_val + eps                         # [N]

        # Items accept the single highest bid among unassigned bidders.
        # Each point bids on exactly one item, so winners are unique per item.
        bids_on = unassigned[:, None] & (best_idx[:, None] == arange_m[None, :])
        bid_mat = jnp.where(bids_on, bid_inc[:, None], -jnp.inf)      # [N, M]
        max_bid = jnp.max(bid_mat, axis=0)                            # [M]
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)        # [M]
        has_bid = jnp.isfinite(max_bid)

        # Evict previous owners of re-won items.
        prev_owner = assignment_inv                                    # [M]
        evict = jnp.where(has_bid & (prev_owner >= 0), prev_owner, n)
        assignment = assignment.at[evict].set(-1, mode="drop")
        # Install winners.
        win_item = jnp.where(has_bid, arange_m, -1)
        win_point = jnp.where(has_bid, winner, n)
        assignment = assignment.at[win_point].set(win_item, mode="drop")
        assignment_inv = jnp.where(has_bid, winner, assignment_inv)
        price = price + jnp.where(has_bid, max_bid, 0.0)
        return assignment, assignment_inv, price

    init = (
        jnp.full((n,), -1, jnp.int32),
        jnp.full((m,), -1, jnp.int32),
        jnp.zeros((m,), d.dtype),
    )
    assignment, _, price = lax.fori_loop(0, iters, round_fn, init)

    # Forced final pass (CUDA `Assign` with last=true): leftover points take
    # their current best item regardless of conflicts.
    value = -d - price[None, :]
    best_idx = jnp.argmax(value, axis=-1).astype(jnp.int32)
    return jnp.where(assignment < 0, best_idx, assignment)


def _auction_single_scaled(d: jax.Array, eps: float, iters: int,
                           phases: int = 4, theta: float = 8.0) -> jax.Array:
    """Auction with epsilon-scaling + early termination (Bertsekas).

    Runs `phases` rounds of the Jacobi auction with eps_p = eps * theta^
    (phases-1-p), carrying prices between phases (assignments reset each
    phase), each phase a `while_loop` that stops as soon as every point is
    assigned. A completed final phase yields a FULL assignment (a bijection)
    that is N*eps-optimal — strictly stronger than the fixed-iteration
    variant above, whose forced last pass can leave an invalid matching (the
    convergence audit in BASELINE.md measured it UNDERestimating EMD at low
    iteration counts). Typical cost at N=2048: a few hundred total rounds vs
    the reference test regime's fixed 10000 (`metrics/emd/README.md:7-8`),
    for the same (or tighter) optimality bound. `iters` caps TOTAL rounds
    across phases; leftover points after the cap take their current best
    item, like the CUDA forced pass."""
    n, m = d.shape
    arange_m = jnp.arange(m, dtype=jnp.int32)

    def make_round(eps_p):
        def round_fn(state):
            it, assignment, assignment_inv, price = state
            unassigned = assignment < 0
            value = -d - price[None, :]
            best_val = jnp.max(value, axis=1)
            best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)
            masked = jnp.where(arange_m[None, :] == best_idx[:, None],
                               -jnp.inf, value)
            second_val = jnp.max(masked, axis=1)
            bid_inc = best_val - second_val + eps_p
            bids_on = unassigned[:, None] & (
                best_idx[:, None] == arange_m[None, :])
            bid_mat = jnp.where(bids_on, bid_inc[:, None], -jnp.inf)
            max_bid = jnp.max(bid_mat, axis=0)
            winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
            has_bid = jnp.isfinite(max_bid)
            prev_owner = assignment_inv
            evict = jnp.where(has_bid & (prev_owner >= 0), prev_owner, n)
            assignment = assignment.at[evict].set(-1, mode="drop")
            win_item = jnp.where(has_bid, arange_m, -1)
            win_point = jnp.where(has_bid, winner, n)
            assignment = assignment.at[win_point].set(win_item, mode="drop")
            assignment_inv = jnp.where(has_bid, winner, assignment_inv)
            price = price + jnp.where(has_bid, max_bid, 0.0)
            return it + 1, assignment, assignment_inv, price
        return round_fn

    it = jnp.int32(0)
    price = jnp.zeros((m,), d.dtype)
    assignment = jnp.full((n,), -1, jnp.int32)
    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        assignment = jnp.full((n,), -1, jnp.int32)
        assignment_inv = jnp.full((m,), -1, jnp.int32)
        it, assignment, assignment_inv, price = lax.while_loop(
            lambda s: (s[0] < iters) & jnp.any(s[1] < 0),
            make_round(eps_p),
            (it, assignment, assignment_inv, price))

    value = -d - price[None, :]
    best_idx = jnp.argmax(value, axis=-1).astype(jnp.int32)
    return jnp.where(assignment < 0, best_idx, assignment)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def emd_auction(xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005,
                iters: int = 50,
                scaled: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Approximate EMD. Returns (dist [B,N] squared, assignment [B,N] int32).

    scaled=False reproduces the reference solver exactly (fixed-iteration
    Jacobi auction + forced final assignment — the CUDA contract; the train
    regime eps=0.005/50 stays on this path). scaled=True enables
    epsilon-scaling + early termination (`_auction_single_scaled`): same
    N*eps optimality bound, typically ~10-30x fewer rounds at the test
    regime — the default for the metric protocol in eval/metrics.py."""
    dist, assignment = _emd_forward(xyz1, xyz2, eps, iters, scaled)
    return dist, assignment


def _emd_forward(xyz1, xyz2, eps, iters, scaled=False):
    d = pairwise_sqdist(xyz1, xyz2)
    B, N, M = d.shape
    if scaled:
        from sp_gan_tpu.ops.dispatch import pallas_enabled
        if pallas_enabled() and (16 << 20) < N * M * 4 <= (1 << 30):
            # Matrix too big for the VMEM-resident kernel but solver state
            # [price/owner, O(M)] still fits: HBM-resident block
            # Gauss-Seidel (mode="blockgs_hbm") DMAs one [w, M] row-block
            # per round, so the active-set tail pays w/N of the matrix in
            # DMA instead of re-streaming all of it like the XLA path.
            # The handoff is at 16 MB (= N=2048), not the VMEM capacity:
            # the r3/r4 sweeps both found the VMEM kernel's compile FAILS
            # at N=4096 (64 MB + scratch overflows the 96 MB budget in
            # the compile helper) while blockgs_hbm runs 8.7 solves/s
            # there (runs/sweep_auction_largen.jsonl).
            from sp_gan_tpu.ops.pallas.auction import (
                auction_assignment_pallas)
            phases = 1 if iters <= 500 else 4
            assignment = auction_assignment_pallas(d, eps, iters,
                                                   phases=phases,
                                                   mode="blockgs_hbm",
                                                   block_w=64)
        elif pallas_enabled() and N * M * 4 <= (16 << 20):
            # VMEM-resident solver: whole [N, M] distance block + prices +
            # owners stay on-core. r3 default is the block Gauss-Seidel
            # active-set kernel (mode="blockgs", ops/pallas/auction.py):
            # rounds bid one 64-row block against all items and converged
            # blocks are skipped via exact per-block unassigned counts —
            # 33.8 (hard) / 59.0 (shape) solves/s at the N=2048 metric
            # regime on v5e vs 4.6 / 12.3 for the r2 Jacobi rounds, with
            # valid bijections and the same N*eps optimality bound.
            # Small caps (train-regime CutMix, iters<=500) skip the
            # eps-scaling phases: a single phase at the target eps with
            # early termination is the reference's own dynamics minus the
            # wasted post-convergence rounds.
            from sp_gan_tpu.ops.pallas.auction import (
                auction_assignment_pallas)
            phases = 1 if iters <= 500 else 4
            assignment = auction_assignment_pallas(d, eps, iters,
                                                   phases=phases,
                                                   mode="blockgs",
                                                   block_w=64)
        else:
            # Same phase heuristic as the pallas path: small caps (train-
            # regime CutMix, iters<=500) run a single phase at the target
            # eps — with 4 coarse phases a small TOTAL budget could be
            # exhausted before the final phase ran any rounds, degrading
            # the result to all-forced assignments.
            phases = 1 if iters <= 500 else 4
            assignment = jax.vmap(
                lambda dd: _auction_single_scaled(dd, eps, iters,
                                                  phases=phases))(d)
    else:
        assignment = jax.vmap(lambda dd: _auction_single(dd, eps, iters))(d)
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    dist = jnp.sum((xyz1 - matched) ** 2, axis=-1)
    return dist, assignment


def _emd_fwd(xyz1, xyz2, eps, iters, scaled=False):
    dist, assignment = _emd_forward(xyz1, xyz2, eps, iters, scaled)
    return (dist, assignment), (xyz1, xyz2, assignment)


def _emd_bwd(eps, iters, scaled, res, g):
    xyz1, xyz2, assignment = res
    g_dist, _ = g
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    # d(dist_i)/d(xyz1_i) = 2 (xyz1_i - xyz2_{sigma(i)}); xyz2 gets no grad,
    # matching the reference backward (emd_module.py:66-72).
    grad1 = 2.0 * g_dist[..., None] * (xyz1 - matched)
    return grad1, jnp.zeros_like(xyz2)


emd_auction.defvjp(_emd_fwd, _emd_bwd)


def emd_cost(xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005,
             iters: int = 50, scaled: bool = False) -> jax.Array:
    """Mean L2 matching cost per cloud: [B]. (sqrt of per-point sq dists)."""
    dist, _ = emd_auction(xyz1, xyz2, eps, iters, scaled)
    return jnp.sqrt(jnp.maximum(dist, 0.0)).mean(axis=-1)
