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
                                    "packed"))
def auction_assignment_pallas(d: jax.Array, eps: float = 0.002,
                              iters: int = 10000, phases: int = 4,
                              theta: float = 8.0,
                              packed: bool = False) -> jax.Array:
    """d: [B, N, M] pairwise squared distances -> assignment [B, N] int32
    (for each point of cloud 1, the matched item of cloud 2).

    packed=True runs the merged-pass round (packed int32 reduces — see
    `_auction_kernel_packed`). r3 A/B on v5e at N=2048 metric regime:
    4.37 vs 4.61 solves/s (hard instances) and 11.8 vs 12.3 (shape
    instances) — a small REGRESSION: Mosaic already fuses the min+argmin
    pattern, and per-round cost is bound by the [N, M] VMEM traffic of the
    ~5 logical array traversals, not by reduce count. Kept for the record;
    default stays the separate-reduce kernel. Phase/theta sweep at the same
    regime: (4, 8) best of {(4,8),(6,4),(8,3),(5,6),(10,2)} — both knobs
    are at their floor; further EMD speed needs an active-set
    restructuring (rounds on compacted unassigned rows)."""
    B, N, M = d.shape
    kern = _auction_kernel_packed if packed else _auction_kernel
    kernel = functools.partial(kern, n=N, m=M, eps=eps,
                               iters=iters, phases=phases, theta=theta)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((M,), jnp.float32),       # price
            pltpu.VMEM((M,), jnp.int32),         # owner
            pltpu.SMEM((1,), jnp.int32),         # unassigned count
            pltpu.SMEM((1,), jnp.int32),         # cumulative round counter
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * N * M * 20 * min(iters, 4000), transcendentals=0,
            bytes_accessed=B * N * M * 4 + B * N * 4),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(d.astype(jnp.float32))[:, 0]
