"""Fused kNN selection kernel.

For each query tile of TQ points, the kernel computes squared distances to all
N points of the same cloud — one [TQ, C] x [C, N] MXU matmul plus VPU
row/col-norm adds — entirely in VMEM, then extracts the k nearest by k rounds
of (min, argmin, mask). The [B, N, N] distance matrix never touches HBM
(the XLA path writes it out and reads it back: ~2 x 16MB per cloud at N=2048).

Self-exclusion matches `ops.pairwise.knn_indices`: the diagonal is masked to
+inf, neighbors come out in ascending-distance order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(x_ref, idx_ref, dist_ref, *, k: int, tq: int, n: int):
    q = pl.program_id(1)
    queries = x_ref[0, pl.ds(q * tq, tq), :]                # [TQ, C]
    keys = x_ref[0]                                         # [N, C]

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [TQ, 1]
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)        # [N, 1]
    cross = jax.lax.dot_general(
        queries, keys,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 MXU rounding flips near-ties
    )                                                        # [TQ, N]
    dist = qn - 2.0 * cross + kn.T

    # mask self
    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    dist = jnp.where(row_ids == col_ids, jnp.inf, dist)

    # k rounds of (min, argmin, mask). A packed dist|index single-reduce
    # variant was tried (bitcast-monotonic trick) but flips ~0.1% of
    # neighbors on near-ties in feature space — exactness wins; step time
    # was unchanged either way.
    def body(j, d):
        m = jnp.min(d, axis=1)                               # [TQ]
        a = jnp.argmin(d, axis=1).astype(jnp.int32)          # [TQ]
        idx_ref[0, :, j] = a
        dist_ref[0, :, j] = m
        return jnp.where(col_ids == a[:, None], jnp.inf, d)

    lax.fori_loop(0, k, body, dist, unroll=True)


def _knn_blocked_kernel(q_ref, key_ref, idx_ref, dist_ref, *, k: int,
                        tq: int, cb: int):
    """Large-N kNN: the grid's third axis walks [TQ, CB] key-blocks, the
    revisited (idx, dist) output blocks hold the running top-k. VMEM stays
    ~3 MB regardless of N (the dense [TQ, N] tile of the small-N kernel was
    the round-1 N=20000 OOM)."""
    q = pl.program_id(1)
    kb = pl.program_id(2)
    queries = q_ref[0].astype(jnp.float32)                  # [TQ, C]
    keys = key_ref[0].astype(jnp.float32)                   # [CB, C]
    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        queries, keys, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [TQ, CB]
    d = qn - 2.0 * cross + kn.T
    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, cb), 0)
    cols = kb * cb + jax.lax.broadcasted_iota(jnp.int32, (tq, cb), 1)
    d = jnp.where(row_ids == cols, jnp.inf, d)              # self-exclude
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, cb), 1)

    vals = jnp.where(kb == 0, jnp.inf, dist_ref[0])         # [TQ, k]
    idxs = jnp.where(kb == 0, 0, idx_ref[0])

    # block-local top-k
    bvals, bidxs = [], []
    for j in range(k):
        m = jnp.min(d, axis=1)
        a = jnp.argmin(d, axis=1).astype(jnp.int32)
        bvals.append(m[:, None])
        bidxs.append((kb * cb + a)[:, None])
        d = jnp.where(col_iota == a[:, None], jnp.inf, d)

    # merge running k with block k over [TQ, 2k]
    catv = jnp.concatenate([vals] + bvals, axis=1)          # [TQ, 2k]
    cati = jnp.concatenate([idxs] + bidxs, axis=1)
    iota2k = jax.lax.broadcasted_iota(jnp.int32, (tq, 2 * k), 1)
    nvals, nidxs = [], []
    for j in range(k):
        m = jnp.min(catv, axis=1)
        p = jnp.argmin(catv, axis=1).astype(jnp.int32)
        sel = iota2k == p[:, None]
        nvals.append(m[:, None])
        nidxs.append(jnp.sum(jnp.where(sel, cati, 0), axis=1)[:, None])
        catv = jnp.where(sel, jnp.inf, catv)
    dist_ref[0] = jnp.concatenate(nvals, axis=1)
    idx_ref[0] = jnp.concatenate(nidxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tq", "cb"))
def knn_pallas_blocked(x: jax.Array, k: int, tq: int = 256, cb: int = 2048):
    """Large-N kNN: x [B, N, C] -> (idx, dist) like `knn_pallas`, with
    key-axis blocking (VERDICT r1 #10 — replaces the tq=8 fallback cliff)."""
    x = x.astype(jnp.float32)
    B, N, C = x.shape
    while N % tq:
        tq //= 2
    cb = min(cb, N)
    while N % cb:
        cb //= 2
    kernel = functools.partial(_knn_blocked_kernel, k=k, tq=tq, cb=cb)
    idx, dist = pl.pallas_call(
        kernel,
        grid=(B, N // tq, N // cb),
        in_specs=[
            pl.BlockSpec((1, tq, C), lambda b, q, kb: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, C), lambda b, q, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, k), lambda b, q, kb: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, q, kb: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C, transcendentals=0,
            bytes_accessed=B * N * C * 4 * (N // tq) + B * N * k * 8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, x)
    return idx, dist


def _dist_cross(queries, keys, mode: str):
    """[TQ, C] x [N, C]^T -> [TQ, N] inner products at selectable precision.

    "highest": 6-pass f32 emulation (exact-f32 selection; the r1 choice).
    "bf16_3x": manual hi/lo split, 3 bf16 passes — ~1.5e-7 relative error,
      the same ballpark as a single f32 rounding; Mosaic exposes no
      Precision.HIGH so the split is written out. Half the MXU passes of
      "highest", which dominates the kernel (k=1 cost 3.5 of 5.4 ms at
      B=24 N=2048 C=64: the distance matmul, not the selection loop).
    """
    if mode == "highest":
        return jax.lax.dot_general(
            queries, keys, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    bf16 = jnp.bfloat16
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    qhi = queries.astype(bf16)
    khi = keys.astype(bf16)
    if mode == "bf16":          # cost-probe only: selection too coarse
        return mm(qhi, khi)
    qlo = (queries - qhi.astype(jnp.float32)).astype(bf16)
    klo = (keys - khi.astype(jnp.float32)).astype(bf16)
    return mm(qhi, khi) + (mm(qhi, klo) + mm(qlo, khi))


def _knn_edge_kernel(x_ref, ee_ref, idx_ref, *, k: int, tq: int, n: int,
                     c: int, cd, diff_only: bool = False,
                     dist_mode: str = "highest",
                     select_mode: str = "exact"):
    """kNN selection + neighbor gather + edge-feature construction in one
    sweep: the per-round argmin's one-hot mask doubles as the gather matrix
    (one-hot @ keys on the MXU — entries exactly 1.0, so the gather is
    exact in any dtype). Kills the separate XLA gather, which ran at ~2%
    HBM bandwidth (~12 ms/step of the r1 default, trace-verified).

    diff_only: emit just `nbr - central` [tq, k, C] instead of the
    concatenated [central, nbr - central] [tq, k, 2C] — the central half is
    x broadcast k times, which EdgeBlock can fold into its conv_x matmul
    directly; skipping it halves the kernel's HBM output bytes."""
    q = pl.program_id(1)
    keys_raw = x_ref[0]                                     # [N, C] x.dtype
    queries_raw = x_ref[0, pl.ds(q * tq, tq), :]
    keys = keys_raw.astype(jnp.float32)
    queries = queries_raw.astype(jnp.float32)

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = _dist_cross(queries, keys, dist_mode)
    dist = qn - 2.0 * cross + kn.T                          # [TQ, N]

    row_ids = q * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    dist = jnp.where(row_ids == col_ids, jnp.inf, dist)

    central = queries_raw.astype(cd)
    bf16 = jnp.bfloat16
    if cd == bf16:
        key_parts = [keys_raw.astype(bf16)]
    else:
        # exact f32 gather from bf16 matmuls: v = hi + mid + lo with each
        # part bf16 (8-bit mantissas covering f32's 24); the one-hot rows
        # pick single values, so the sum reconstructs v exactly. Mosaic has
        # no HIGH precision and HIGHEST (6-pass) costs 2x this.
        hi = keys.astype(bf16)
        r1 = keys - hi.astype(jnp.float32)
        mid = r1.astype(bf16)
        lo = (r1 - mid.astype(jnp.float32)).astype(bf16)
        key_parts = [hi, mid, lo]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    if select_mode == "packed":
        # Single-reduce selection: bitcast the (non-negative) f32 distances
        # to int32 — monotonic for non-negative floats — truncate the low
        # ceil(log2 n) mantissa bits and pack the column index there. One
        # int-min reduce per round then yields BOTH the (quantized) min and
        # its argmin, with exact lowest-index tie-breaking inside a bucket.
        # Contract change vs "exact": neighbors whose distances agree to
        # within ~n ulps (relative ~n*2^-24 ≈ 1.2e-4 at n=2048) order by
        # index instead of by sub-quantum value — the regime where f32
        # rounding already scrambles order. Guarded by the agreement test
        # in tests/test_pallas.py (TestKnnEdgePacked).
        bits = max((n - 1).bit_length(), 1)
        low_mask = (1 << bits) - 1
        d_pos = jnp.maximum(dist, 0.0)                      # [TQ, N] f32
        d_int = pltpu.bitcast(d_pos, jnp.int32)
        packed = (d_int & ~low_mask) | col_ids
        big = jnp.int32(2 ** 31 - 1)
        for j in range(k):
            pm = jnp.min(packed, axis=1)                    # [TQ] int32
            a = pm & low_mask
            oh = col_ids == a[:, None]
            ohb = oh.astype(bf16)
            nbr = mm(ohb, key_parts[0])
            for part in key_parts[1:]:
                nbr += mm(ohb, part)
            nbr = nbr.astype(cd)
            idx_ref[0, :, j] = a
            if diff_only:
                ee_ref[0, :, j * c:(j + 1) * c] = nbr - central
            else:
                ee_ref[0, :, j, :] = jnp.concatenate(
                    [central, nbr - central], axis=-1)
            packed = jnp.where(oh, big, packed)
        return

    for j in range(k):
        a = jnp.argmin(dist, axis=1).astype(jnp.int32)      # [TQ]
        oh = col_ids == a[:, None]                          # [TQ, N]
        ohb = oh.astype(bf16)
        nbr = mm(ohb, key_parts[0])
        for part in key_parts[1:]:
            nbr += mm(ohb, part)
        nbr = nbr.astype(cd)                                # [TQ, C]
        idx_ref[0, :, j] = a
        if diff_only:
            # flat [TQ, k*C] layout: storing [TQ, C] into a [1, TQ, 1, C]
            # block slot needs a Mosaic interior-unit-dim reshape that fails
            # to lower for bf16 at C=64; a static lane slice does not
            ee_ref[0, :, j * c:(j + 1) * c] = nbr - central
        else:
            ee_ref[0, :, j, :] = jnp.concatenate(
                [central, nbr - central], axis=-1)
        dist = jnp.where(oh, jnp.inf, dist)


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "out_dtype", "diff_only",
                                    "dist_mode", "select_mode"))
def knn_edge_pallas(x: jax.Array, k: int, out_dtype=None, tq: int = 256,
                    diff_only: bool = False, dist_mode: str = "highest",
                    select_mode: str = "exact"):
    """x: [B, N, C] -> (ee [B, N, k, 2C] in out_dtype (default x.dtype),
    idx [B, N, k] int32). Fused kNN (self-excluded, ascending) + edge
    features [central, nbr - central] — see `_knn_edge_kernel`. With
    diff_only=True, ee is just `nbr - central` [B, N, k, C].

    The distance selection always runs in f32 regardless of out_dtype, so a
    bf16 edge tensor (mixed_edge) keeps f32-exact neighbor choice."""
    B, N, C = x.shape
    cd = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    if N > 8192:
        raise ValueError(
            f"knn_edge_pallas needs the dense [tq, N] distance tile in VMEM "
            f"(N={N} > 8192); use knn_pallas_blocked + edge_features(idx=...)"
        )
    while N % tq:
        tq //= 2
    grid = (B, N // tq)
    ec = C if diff_only else 2 * C
    ee_spec = (pl.BlockSpec((1, tq, k * C), lambda b, q: (b, q, 0),
                            memory_space=pltpu.VMEM)
               if diff_only else
               pl.BlockSpec((1, tq, k, ec), lambda b, q: (b, q, 0, 0),
                            memory_space=pltpu.VMEM))
    ee_shape = (B, N, k * C) if diff_only else (B, N, k, ec)
    kernel = functools.partial(_knn_edge_kernel, k=k, tq=tq, n=N, c=C, cd=cd,
                               diff_only=diff_only, dist_mode=dist_mode,
                               select_mode=select_mode)
    ee, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            ee_spec,
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(ee_shape, cd),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C * (1 + k // 4), transcendentals=0,
            bytes_accessed=B * N * C * 4 * (N // tq)
            + B * N * k * (ec * cd.itemsize + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x)
    if diff_only:
        ee = ee.reshape(B, N, k, C)   # trailing-dim split: layout no-op
    return ee, idx


def _knn_edge_window_kernel(xp_ref, ee_ref, idx_ref, *, k: int, tq: int,
                            n: int, w: int, c: int, cd,
                            diff_only: bool = False,
                            dist_mode: str = "highest",
                            select_mode: str = "packed"):
    """Banded variant of `_knn_edge_kernel` (`--knn_mode approx`): each
    query's candidate set is exactly the circular index band |i - j| <= W
    (self excluded) instead of all N keys — O(N*W) pairs instead of O(N^2).
    Sound when index order tracks spatial order (the fibonacci template's
    spiral; 99%+ neighbor recall measured on TRAINED N=8192 features,
    runs/probe_approx_knn.jsonl). Input is the wrap-padded xp
    [B, N + 2W, C]; the key tile for query block q is the contiguous slice
    xp[q*tq : q*tq + tq + 2W] — no gathers. Selection, distance precision
    and the one-hot MXU gather all match the exact kernel; emitted indices
    are global (mod N), so the backward scatter is unchanged."""
    q = pl.program_id(1)
    wtot = tq + 2 * w
    queries_raw = xp_ref[0, pl.ds(q * tq + w, tq), :]       # [TQ, C]
    keys_raw = xp_ref[0, pl.ds(q * tq, wtot), :]            # [Wtot, C]
    queries = queries_raw.astype(jnp.float32)
    keys = keys_raw.astype(jnp.float32)

    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
    kn = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = _dist_cross(queries, keys, dist_mode)
    dist = qn - 2.0 * cross + kn.T                          # [TQ, Wtot]

    # exact +-W band, self excluded: query (local row i) sits at key
    # position W + i; band = |pos - (W + i)| <= W. Masking to the exact
    # band makes the candidate set independent of tq (testable contract).
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, wtot), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, wtot), 1)
    off = col_ids - rows - w                                # in [-W, W]
    dist = jnp.where((off == 0) | (jnp.abs(off) > w), jnp.inf, dist)

    central = queries_raw.astype(cd)
    bf16 = jnp.bfloat16
    if cd == bf16:
        key_parts = [keys_raw.astype(bf16)]
    else:
        hi = keys.astype(bf16)
        r1 = keys - hi.astype(jnp.float32)
        mid = r1.astype(bf16)
        lo = (r1 - mid.astype(jnp.float32)).astype(bf16)
        key_parts = [hi, mid, lo]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    def to_global(a):
        g = q * tq - w + a                                  # [TQ] int32
        g = jnp.where(g < 0, g + n, g)
        return jnp.where(g >= n, g - n, g)

    def emit(j, a, oh):
        ohb = oh.astype(bf16)
        nbr = mm(ohb, key_parts[0])
        for part in key_parts[1:]:
            nbr += mm(ohb, part)
        nbr = nbr.astype(cd)
        idx_ref[0, :, j] = to_global(a)
        if diff_only:
            ee_ref[0, :, j * c:(j + 1) * c] = nbr - central
        else:
            ee_ref[0, :, j, :] = jnp.concatenate(
                [central, nbr - central], axis=-1)

    if select_mode == "packed":
        bits = max((wtot - 1).bit_length(), 1)
        low_mask = (1 << bits) - 1
        d_pos = jnp.maximum(dist, 0.0)
        # inf stays inf through the bitcast (its exponent bits dominate),
        # so masked cols never win the int-min reduce
        d_int = pltpu.bitcast(d_pos, jnp.int32)
        packed = (d_int & ~low_mask) | col_ids
        big = jnp.int32(2 ** 31 - 1)
        for j in range(k):
            pm = jnp.min(packed, axis=1)
            a = pm & low_mask
            oh = col_ids == a[:, None]
            emit(j, a, oh)
            packed = jnp.where(oh, big, packed)
        return

    for j in range(k):
        a = jnp.argmin(dist, axis=1).astype(jnp.int32)
        oh = col_ids == a[:, None]
        emit(j, a, oh)
        dist = jnp.where(oh, jnp.inf, dist)


@functools.partial(jax.jit,
                   static_argnames=("k", "window", "out_dtype", "tq",
                                    "diff_only", "dist_mode", "select_mode"))
def knn_edge_window_pallas(x: jax.Array, k: int, window: int, out_dtype=None,
                           tq: int = 256, diff_only: bool = False,
                           dist_mode: str = "highest",
                           select_mode: str = "exact"):
    """Banded fused kNN + edge features: like `knn_edge_pallas` but each
    query selects among exactly the circular index band |i - j| <= window
    (self excluded, ascending, f32 selection). O(N * window) pairs — the
    large-N `--knn_mode approx` kernel. Returns (ee, idx) with GLOBAL idx.

    Requires 2*window + tq <= N (no duplicate keys inside a band slice);
    window is clamped to that bound."""
    B, N, C = x.shape
    cd = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    while N % tq:
        tq //= 2
    W = int(min(window, (N - tq) // 2))
    assert W >= k, (W, k)
    wtot = tq + 2 * W
    xp = jnp.concatenate([x[:, -W:], x, x[:, :W]], axis=1)  # [B, N+2W, C]
    ec = C if diff_only else 2 * C
    ee_spec = (pl.BlockSpec((1, tq, k * C), lambda b, q: (b, q, 0),
                            memory_space=pltpu.VMEM)
               if diff_only else
               pl.BlockSpec((1, tq, k, ec), lambda b, q: (b, q, 0, 0),
                            memory_space=pltpu.VMEM))
    ee_shape = (B, N, k * C) if diff_only else (B, N, k, ec)
    kernel = functools.partial(_knn_edge_window_kernel, k=k, tq=tq, n=N,
                               w=W, c=C, cd=cd, diff_only=diff_only,
                               dist_mode=dist_mode, select_mode=select_mode)
    ee, idx = pl.pallas_call(
        kernel,
        grid=(B, N // tq),
        in_specs=[pl.BlockSpec((1, N + 2 * W, C), lambda b, q: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            ee_spec,
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(ee_shape, cd),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * wtot * C * (1 + k // 4), transcendentals=0,
            bytes_accessed=B * (N + 2 * W) * C * 4 * (N // tq)
            + B * N * k * (ec * cd.itemsize + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp)
    if diff_only:
        ee = ee.reshape(B, N, k, C)
    return ee, idx


@functools.partial(jax.jit, static_argnames=("k", "tq"))
def knn_pallas(x: jax.Array, k: int, tq: int = 256):
    """x: [B, N, C] -> (idx [B, N, k] int32, dist [B, N, k]).

    N must be a multiple of tq (pad upstream if not; the framework's point
    counts 256..20000 templates satisfy this for tq in {128, 256}).

    Indices and distances are exact; ties break toward the lower index
    (same as argmin).
    """
    # distances always in f32: bf16 inputs both lose selection accuracy and
    # can't drive an fp32-precision MXU contraction in Mosaic
    x = x.astype(jnp.float32)
    B, N, C = x.shape
    if N > 8192:
        # dense [TQ, N] distance tiles stop fitting VMEM; switch to the
        # key-blocked running-top-k kernel (VERDICT r1 #10)
        return knn_pallas_blocked(x, k)
    if N % tq != 0:
        cand = tq
        while cand >= 1 and N % cand:
            cand //= 2
        tq = max(cand, 1)
    grid = (B, N // tq)

    kernel = functools.partial(_knn_kernel, k=k, tq=tq, n=N)
    idx, dist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C, transcendentals=0,
            bytes_accessed=B * N * C * 4 * (N // tq) + B * N * k * 8),
        # the dense [TQ, N] distance tile + self-mask iotas + unrolled
        # selection temporaries reach ~21.5 MB at tq=256/N=8192 — over
        # XLA's ~16.6 MB default scoped-vmem limit (the r4 stage-6 eval
        # OOM); cap explicitly like the fused edge kernel does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x)
    return idx, dist
