"""VMEM-resident auction solver for EMD.

The XLA auction (`ops/emd.py`) pays HBM for every round: the [N, M] value
computation re-streams the 16 MB distance matrix (plus masks and bid
matrices) through HBM ~5 times per round, ~0.2 ms/round at N=2048 — and the
reference test regime runs up to 10000 rounds per pair
(`/root/reference/metrics/emd/README.md:7-8`; CUDA kernels
`Bid`/`GetMax`/`Assign` in `emd_cuda.cu` have the same per-round structure).

Here one grid step solves one cloud pair with ALL solver state resident in
VMEM: the [N, M] squared-distance block, the price vector, and the per-item
owner vector. A round is ~5 VPU passes over the VMEM-resident [N, M] tile
(~µs-scale), so the whole solve runs at VPU speed instead of HBM speed.

Two reformulations make the kernel TPU-shaped:
  * No scatters. The Gauss-Seidel/CUDA formulation tracks per-point
    assignment and evicts owners by indexed writes. Tracking only the
    per-ITEM `owner` vector makes every update elementwise ([M]-wide
    where), and "point p is unassigned" is recovered as
    `~any_m(owner[m] == p)` — one [N, M] compare+reduce, the same cost
    class as the value pass.
  * No data-dependent trip count. Each epsilon-scaling phase runs a
    `fori_loop` with a static cap whose body is wrapped in
    `@pl.when(not converged)`: converged pairs burn only a scalar check
    per remaining iteration.

Epsilon-scaling (Bertsekas): phases at eps * theta^(phases-1-p), prices
carried across phases, owners reset. A completed final phase is a full
bijection within N*eps of optimal — stronger than the CUDA forced final
assignment, which can leave an invalid matching (measured UNDERestimating
EMD in the BASELINE.md convergence audit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _auction_kernel_packed(d_ref, asg_ref, price_ref, owner_ref, flag_ref,
                           it_ref, *, n: int, m: int, eps: float, iters: int,
                           phases: int, theta: float):
    """Merged-pass auction round (VERDICT r2 #4): the per-row best/second
    and the per-item accepted bid each come out of ONE packed int32 reduce
    instead of separate (min, argmin) + compare passes.

    Packing: squared distances are non-negative, so their f32 bits are
    monotonic as int32; the low ceil(log2 max(n,m)) mantissa bits are
    replaced with the column (or row) index. A single min (or max) reduce
    then yields both the quantized extremum and its exact arg, with
    deterministic lowest-index tie-breaking. Quantization (~1.2e-4 relative
    at n=2048) only perturbs bid increments by a fraction of eps — the
    N*eps optimality contract holds with eps' = eps*(1+~0.12), verified
    against the Hungarian optimum in tests/test_pallas.py."""
    d = d_ref[0]                                             # [N, M] f32
    col_m = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    price_ref[:] = jnp.zeros((m,), jnp.float32)
    it_ref[0] = 0

    bits = max((max(n, m) - 1).bit_length(), 1)
    low = (1 << bits) - 1
    hi = ~low
    BIG = jnp.int32(2 ** 31 - 1)
    SMALL = jnp.int32(-(2 ** 31 - 1))

    def one_round(eps_p):
        price = price_ref[:]                                 # [M]
        owner = owner_ref[:]                                 # [M] int32
        # point p unassigned iff no item's owner == p
        owned = jnp.max(jnp.where(owner[None, :] == row_n, 1, 0), axis=1)
        unassigned = owned == 0                              # [N]
        flag_ref[0] = jnp.sum(jnp.where(unassigned, 1, 0))

        u = jnp.maximum(d + price[None, :], 0.0)             # [N, M]
        u_pk = (jax.lax.bitcast_convert_type(u, jnp.int32) & hi) | col_m
        p1 = jnp.min(u_pk, axis=1)                           # [N] packed
        a = p1 & low                                         # best item
        is_best = col_m == a[:, None]
        p2 = jnp.min(jnp.where(is_best, BIG, u_pk), axis=1)
        best_u = jax.lax.bitcast_convert_type(p1 & hi, jnp.float32)
        second_u = jax.lax.bitcast_convert_type(p2 & hi, jnp.float32)
        bid_inc = second_u - best_u + eps_p                  # [N] >= ~eps_p

        # item side: accept the highest bid among unassigned bidders —
        # one packed max reduce over the point axis gives value AND winner
        bp = jax.lax.bitcast_convert_type(jnp.maximum(bid_inc, 0.0), jnp.int32) & hi  # [N]
        bid_pk = jnp.where(unassigned[:, None] & is_best,
                           bp[:, None] | row_n, SMALL)
        pm = jnp.max(bid_pk, axis=0)                         # [M]
        has_bid = pm > SMALL
        winner = pm & low
        max_bid = jax.lax.bitcast_convert_type(pm & hi, jnp.float32)

        owner_ref[:] = jnp.where(has_bid, winner, owner)
        price_ref[:] = price + jnp.where(has_bid, max_bid, 0.0)
        it_ref[0] = it_ref[0] + 1

    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        owner_ref[:] = jnp.full((m,), -1, jnp.int32)
        flag_ref[0] = n

        def body(i, carry, eps_p=eps_p):
            @pl.when((flag_ref[0] > 0) & (it_ref[0] < iters))
            def _():
                one_round(eps_p)
            return carry

        lax.fori_loop(0, iters, body, 0)

    owner = owner_ref[:]
    price = price_ref[:]
    item_of = jnp.max(
        jnp.where(owner[None, :] == row_n, col_m + 1, 0), axis=1) - 1
    best_idx = jnp.argmin(d + price[None, :], axis=1).astype(jnp.int32)
    asg_ref[0, 0] = jnp.where(item_of < 0, best_idx, item_of)


def _auction_kernel_blockgs(d_ref, asg_ref, price_ref, owner_ref, cnt_ref,
                            it_ref, *, n: int, m: int, eps: float,
                            iters: int, phases: int, theta: float, w: int):
    """Block Gauss-Seidel auction with exact active-block skipping — the
    active-set restructuring that beats the per-round [N, M] floor of the
    Jacobi kernels.

    The point set is split into NB = n/w static blocks. One round processes
    ONE block: its rows of the distance matrix are a dynamic slice (free),
    every pass is [w, M] instead of [N, M]. Auction theory allows any
    subset of unassigned points to bid per round (Gauss-Seidel is the
    textbook special case), and fresher prices between blocks converge in
    fewer sweeps than Jacobi.

    The win: per-block unassigned counts are maintained EXACTLY —
      * accepted bids decrement the bidding block's count (winners are
        always rows of the current block);
      * evicted previous owners increment their own block's count via a
        tiny [NB, M] histogram of `prev_owner // w`;
    so converged blocks are skipped outright (a scalar check), and late
    rounds — the thousands of tail rounds where only a few points remain
    unassigned — touch w/N of the matrix. `iters` caps total block-rounds
    at iters * NB (same total element-budget semantics as the Jacobi
    kernels)."""
    nb = n // w
    col_m = jax.lax.broadcasted_iota(jnp.int32, (w, m), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0)
    arange_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)[0]
    price_ref[:] = jnp.zeros((m,), jnp.float32)
    it_ref[0] = 0          # total block-rounds (budget)
    it_ref[1] = 0          # round-robin cursor

    def one_round(eps_p):
        """Returns the change in total-unassigned (evicted - accepted)."""
        price = price_ref[:]                                 # [M]
        owner = owner_ref[:]                                 # [M] int32
        cnt = cnt_ref[:]                                     # [NB] int32

        # next block with unassigned points, round-robin from the cursor
        start = it_ref[1]
        rel = jnp.mod(arange_nb - start, nb)
        j = jnp.min(jnp.where(cnt > 0, rel, nb)).astype(jnp.int32)
        j = jnp.mod(start + j, nb)
        it_ref[1] = jnp.mod(j + 1, nb)

        rows0 = j * w                                        # global row base
        db = d_ref[0, pl.ds(rows0, w), :]                    # [w, M]
        grow = rows0 + row_w                                 # global row ids
        unassigned = jnp.max(
            jnp.where(owner[None, :] == grow, 1, 0), axis=1) == 0  # [w]

        value = -db - price[None, :]
        best_val = jnp.max(value, axis=1)
        best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)
        is_best = col_m == best_idx[:, None]
        second_val = jnp.max(jnp.where(is_best, _NEG, value), axis=1)
        bid_inc = best_val - second_val + eps_p

        bids_on = unassigned[:, None] & is_best
        bid_mat = jnp.where(bids_on, bid_inc[:, None], _NEG)  # [w, M]
        max_bid = jnp.max(bid_mat, axis=0)                   # [M]
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = max_bid > _NEG * 0.5

        prev_owner = owner
        evicted = jnp.where(has_bid & (prev_owner >= 0), prev_owner, -1)
        # exact count bookkeeping: winners leave block j; evicted rejoin
        # their own blocks
        n_accepted = jnp.sum(jnp.where(has_bid, 1, 0))
        ev_blk = jnp.where(evicted >= 0, evicted // w, nb)    # [M]
        hist = jnp.sum(
            jnp.where(ev_blk[None, :]
                      == jax.lax.broadcasted_iota(jnp.int32, (nb, m), 0),
                      1, 0), axis=1)                          # [NB]
        n_evicted = jnp.sum(hist)
        onehot_j = jnp.where(arange_nb == j, 1, 0)
        cnt_ref[:] = cnt - onehot_j * n_accepted + hist

        owner_ref[:] = jnp.where(has_bid, rows0 + winner, owner)
        price_ref[:] = price + jnp.where(has_bid, max_bid, 0.0)
        it_ref[0] = it_ref[0] + 1
        return n_evicted - n_accepted

    cap = iters * nb
    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        owner_ref[:] = jnp.full((m,), -1, jnp.int32)
        cnt_ref[:] = jnp.full((nb,), w, jnp.int32)

        def cond(carry, _cap=cap):
            tot, it = carry
            return (tot > 0) & (it < _cap)

        def body(carry, eps_p=eps_p):
            tot, it = carry
            delta = one_round(eps_p)
            return tot + delta, it + 1

        # `iters * nb` caps TOTAL block-rounds across phases (same
        # element-budget as `iters` full Jacobi rounds)
        lax.while_loop(cond, body, (jnp.int32(n), it_ref[0]))

    owner = owner_ref[:]
    price = price_ref[:]
    d = d_ref[0]
    col_nm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    row_nm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    item_of = jnp.max(
        jnp.where(owner[None, :] == row_nm, col_nm + 1, 0), axis=1) - 1
    best_idx = jnp.argmin(d + price[None, :], axis=1).astype(jnp.int32)
    asg_ref[0, 0] = jnp.where(item_of < 0, best_idx, item_of)


def _auction_kernel_blockgs_hbm(d_ref, price_out, owner_out, cnt_ref,
                                it_ref, dblk_ref, sem, *, n: int,
                                m: int, eps: float, iters: int, phases: int,
                                theta: float, w: int):
    """Block Gauss-Seidel auction with the [N, M] cost matrix in HBM.

    Same algorithm as `_auction_kernel_blockgs`, for N where the full
    matrix no longer fits VMEM (N=8192 -> 256 MB). Only solver state
    (price/owner/counts, O(M)) is VMEM-resident; each round DMAs the
    active block's [w, M] rows from HBM into `dblk_ref` before bidding.
    The active-set skipping is what makes this viable at HBM distance:
    a round moves w*M*4 bytes (2 MB at w=64, M=8192) only for blocks
    that still have unassigned points — the long convergence tail costs
    DMA for a handful of blocks per sweep instead of re-streaming the
    256 MB matrix like the XLA path does every round.

    Emits final prices and owners as kernel OUTPUTS (full-width static
    stores); the forced final assignment runs in a second, trivially
    blocked kernel (`_forced_assign_kernel`) whose [w, M] d-blocks the
    pallas pipeline streams with static offsets — Mosaic rejects
    dynamic lane-offset vector stores, so the assignment cannot be
    written blockwise from inside this kernel."""
    b = pl.program_id(0)
    nb = n // w
    col_m = jax.lax.broadcasted_iota(jnp.int32, (w, m), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0)
    arange_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)[0]
    price_ref = price_out.at[0, 0]
    owner_ref = owner_out.at[0, 0]
    price_ref[:] = jnp.zeros((m,), jnp.float32)
    it_ref[0] = 0          # total block-rounds (budget)
    it_ref[1] = 0          # round-robin cursor

    def fetch_block(j):
        dma = pltpu.make_async_copy(
            d_ref.at[b, pl.ds(j * w, w), :], dblk_ref, sem)
        dma.start()
        dma.wait()

    def one_round(eps_p):
        price = price_ref[:]                                 # [M]
        owner = owner_ref[:]                                 # [M] int32
        cnt = cnt_ref[:]                                     # [NB] int32

        start = it_ref[1]
        rel = jnp.mod(arange_nb - start, nb)
        j = jnp.min(jnp.where(cnt > 0, rel, nb)).astype(jnp.int32)
        j = jnp.mod(start + j, nb)
        it_ref[1] = jnp.mod(j + 1, nb)

        rows0 = j * w
        fetch_block(j)
        db = dblk_ref[:]                                     # [w, M]
        grow = rows0 + row_w
        unassigned = jnp.max(
            jnp.where(owner[None, :] == grow, 1, 0), axis=1) == 0

        value = -db - price[None, :]
        best_val = jnp.max(value, axis=1)
        best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)
        is_best = col_m == best_idx[:, None]
        second_val = jnp.max(jnp.where(is_best, _NEG, value), axis=1)
        bid_inc = best_val - second_val + eps_p

        bids_on = unassigned[:, None] & is_best
        bid_mat = jnp.where(bids_on, bid_inc[:, None], _NEG)
        max_bid = jnp.max(bid_mat, axis=0)
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = max_bid > _NEG * 0.5

        prev_owner = owner
        evicted = jnp.where(has_bid & (prev_owner >= 0), prev_owner, -1)
        n_accepted = jnp.sum(jnp.where(has_bid, 1, 0))
        ev_blk = jnp.where(evicted >= 0, evicted // w, nb)
        hist = jnp.sum(
            jnp.where(ev_blk[None, :]
                      == jax.lax.broadcasted_iota(jnp.int32, (nb, m), 0),
                      1, 0), axis=1)
        n_evicted = jnp.sum(hist)
        onehot_j = jnp.where(arange_nb == j, 1, 0)
        cnt_ref[:] = cnt - onehot_j * n_accepted + hist

        owner_ref[:] = jnp.where(has_bid, rows0 + winner, owner)
        price_ref[:] = price + jnp.where(has_bid, max_bid, 0.0)
        it_ref[0] = it_ref[0] + 1
        return n_evicted - n_accepted

    cap = iters * nb
    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        owner_ref[:] = jnp.full((m,), -1, jnp.int32)
        cnt_ref[:] = jnp.full((nb,), w, jnp.int32)

        def cond(carry, _cap=cap):
            tot, it = carry
            return (tot > 0) & (it < _cap)

        def body(carry, eps_p=eps_p):
            tot, it = carry
            delta = one_round(eps_p)
            return tot + delta, it + 1

        lax.while_loop(cond, body, (jnp.int32(n), it_ref[0]))


def _auction_kernel(d_ref, asg_ref, price_ref, owner_ref, flag_ref, it_ref, *,
                    n: int, m: int, eps: float, iters: int, phases: int,
                    theta: float):
    d = d_ref[0]                                             # [N, M] f32
    col_m = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)   # item ids
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)   # point ids
    # scratch persists across grid steps (pairs): reset per pair
    price_ref[:] = jnp.zeros((m,), jnp.float32)
    it_ref[0] = 0

    def unassigned_mask(owner):
        # point p assigned iff some item's owner == p; owner rides lanes
        owned = jnp.max(
            jnp.where(owner[None, :] == row_n, 1, 0), axis=1)  # [N]
        return owned == 0

    def one_round(eps_p):
        price = price_ref[:]                                 # [M]
        owner = owner_ref[:]                                 # [M] int32
        unassigned = unassigned_mask(owner)                  # [N]
        # convergence flag from the round-START state: one extra no-op
        # round after convergence instead of a second [N, M] mask pass
        # every round
        flag_ref[0] = jnp.sum(jnp.where(unassigned, 1, 0))

        value = -d - price[None, :]                          # [N, M]
        best_val = jnp.max(value, axis=1)                    # [N]
        best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)
        is_best = col_m == best_idx[:, None]                 # [N, M]
        second_val = jnp.max(jnp.where(is_best, _NEG, value), axis=1)
        bid_inc = best_val - second_val + eps_p              # [N]

        bids_on = unassigned[:, None] & is_best
        bid_mat = jnp.where(bids_on, bid_inc[:, None], _NEG)  # [N, M]
        max_bid = jnp.max(bid_mat, axis=0)                   # [M]
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = max_bid > _NEG * 0.5

        owner_ref[:] = jnp.where(has_bid, winner, owner)
        price_ref[:] = price + jnp.where(has_bid, max_bid, 0.0)
        it_ref[0] = it_ref[0] + 1

    # `iters` caps TOTAL rounds across all phases (same semantics as the
    # XLA `_auction_single_scaled` and the CUDA contract's iteration
    # budget); `it_ref` is the cumulative counter. In practice the
    # eps-scaling phases early-terminate after a few hundred rounds, far
    # below the test-regime cap.
    for p in range(phases):
        eps_p = eps * (theta ** (phases - 1 - p))
        owner_ref[:] = jnp.full((m,), -1, jnp.int32)
        flag_ref[0] = n

        def body(i, carry, eps_p=eps_p):
            @pl.when((flag_ref[0] > 0) & (it_ref[0] < iters))
            def _():
                one_round(eps_p)
            return carry

        lax.fori_loop(0, iters, body, 0)

    # derive per-point assignment; leftover points (cap hit) take their
    # current best item, like the CUDA forced last pass
    owner = owner_ref[:]
    price = price_ref[:]
    item_of = jnp.max(
        jnp.where(owner[None, :] == row_n, col_m + 1, 0), axis=1) - 1  # [N]
    best_idx = jnp.argmax(-d - price[None, :], axis=1).astype(jnp.int32)
    asg_ref[0, 0] = jnp.where(item_of < 0, best_idx, item_of)


@functools.partial(jax.jit,
                   static_argnames=("eps", "iters", "phases", "theta",
                                    "mode", "block_w"))
def auction_assignment_pallas(d: jax.Array, eps: float = 0.002,
                              iters: int = 10000, phases: int = 4,
                              theta: float = 8.0, mode: str = "jacobi",
                              block_w: int = 256) -> jax.Array:
    """d: [B, N, M] pairwise squared distances -> assignment [B, N] int32
    (for each point of cloud 1, the matched item of cloud 2).

    mode:
      "jacobi"  — all unassigned points bid each round; every round costs
        ~5 [N, M] VPU passes.
      "packed"  — jacobi with merged packed-int32 reduces. r3 A/B on v5e at
        the N=2048 metric regime: 4.37 vs 4.61 solves/s (hard) and 11.8 vs
        12.3 (shape instances) — a small REGRESSION: Mosaic already fuses
        the min+argmin pattern and rounds are bound by [N, M] VMEM traffic,
        not reduce count. Kept for the record.
      "blockgs" — block Gauss-Seidel with exact active-block skipping
        (`_auction_kernel_blockgs`): rounds cost [block_w, M] and converged
        blocks are skipped, so the long convergence tail runs at w/N of the
        Jacobi cost.
    Phase/theta sweep at the metric regime: (4, 8) best of
    {(4,8),(6,4),(8,3),(5,6),(10,2)}."""
    B, N, M = d.shape
    if mode == "blockgs_hbm":
        while N % block_w:
            block_w //= 2
        w = block_w
        d = d.astype(jnp.float32)
        solver = functools.partial(_auction_kernel_blockgs_hbm, n=N, m=M,
                                   eps=eps, iters=iters, phases=phases,
                                   theta=theta, w=w)
        price, owner = pl.pallas_call(
            solver,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[
                pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, M), jnp.int32)],
            scratch_shapes=[
                pltpu.VMEM((N // w,), jnp.int32),    # per-block unassigned
                pltpu.SMEM((2,), jnp.int32),         # round counter + cursor
                pltpu.VMEM((w, M), jnp.float32),     # active block rows
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=B * N * M * 20 * min(iters, 4000), transcendentals=0,
                bytes_accessed=B * N * M * 4 + B * N * 4),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(d)
        price, owner = price[:, 0], owner[:, 0]              # [B, M]
        # Forced final assignment in XLA (one fused HBM pass over d —
        # negligible next to the solve): owned rows read the owner
        # inverse via a drop-mode scatter, unowned rows take their
        # price-adjusted argmin — same contract as the VMEM kernels.
        b_idx = jnp.arange(B)[:, None]
        # unowned items carry owner == -1, which would WRAP to N-1 as a
        # scatter index — remap to N so mode="drop" actually drops them
        safe_owner = jnp.where(owner >= 0, owner, N)
        item_of = jnp.full((B, N), -1, jnp.int32).at[
            b_idx, safe_owner].set(jnp.broadcast_to(
                jnp.arange(M, dtype=jnp.int32)[None, :], (B, M)),
            mode="drop")
        best_idx = jnp.argmin(d + price[:, None, :], axis=-1)
        return jnp.where(item_of < 0, best_idx.astype(jnp.int32), item_of)
    if mode == "blockgs":
        while N % block_w:
            block_w //= 2
        kernel = functools.partial(_auction_kernel_blockgs, n=N, m=M,
                                   eps=eps, iters=iters, phases=phases,
                                   theta=theta, w=block_w)
        scratch = [
            pltpu.VMEM((M,), jnp.float32),       # price
            pltpu.VMEM((M,), jnp.int32),         # owner
            pltpu.VMEM((N // block_w,), jnp.int32),  # per-block unassigned
            pltpu.SMEM((2,), jnp.int32),         # round counter + cursor
        ]
    else:
        kern = _auction_kernel_packed if mode == "packed" \
            else _auction_kernel
        kernel = functools.partial(kern, n=N, m=M, eps=eps,
                                   iters=iters, phases=phases, theta=theta)
        scratch = [
            pltpu.VMEM((M,), jnp.float32),       # price
            pltpu.VMEM((M,), jnp.int32),         # owner
            pltpu.SMEM((1,), jnp.int32),         # unassigned count
            pltpu.SMEM((1,), jnp.int32),         # cumulative round counter
        ]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=B * N * M * 20 * min(iters, 4000), transcendentals=0,
            bytes_accessed=B * N * M * 4 + B * N * 4),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(d.astype(jnp.float32))[:, 0]
