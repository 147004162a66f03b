#!/usr/bin/env python
"""On-device (TPU) correctness check for the Pallas kernels vs XLA twins.

The pytest suite runs the same comparisons in interpret mode on CPU; this
script runs them *compiled* on the real chip (catching Mosaic lowering
divergences like the bf16-precision issue found in round 1). Run:

    python scripts/check_tpu_kernels.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sp_gan_tpu.utils import enable_compile_cache


def main():
    enable_compile_cache()
    from sp_gan_tpu.ops.pairwise import knn_indices, pairwise_sqdist
    from sp_gan_tpu.ops.pallas.knn import knn_pallas
    from sp_gan_tpu.ops.pallas.chamfer import _chamfer_pallas_raw
    from sp_gan_tpu.ops.pallas.scatter import scatter_add_pallas

    key = jax.random.PRNGKey(0)
    failures = 0

    def check(name, ok):
        nonlocal failures
        print(("PASS " if ok else "FAIL ") + name, flush=True)
        failures += 0 if ok else 1

    # kNN
    for C in (3, 64):
        x = jax.random.normal(key, (4, 2048, C))
        ip, dp = knn_pallas(x, 10)
        ix, dx = knn_indices(x, 10, return_dists=True)
        check(f"knn idx C={C}",
              bool(jnp.mean((ip == ix).astype(jnp.float32)) > 0.999))
        check(f"knn dist C={C}",
              bool(jnp.max(jnp.abs(dp - dx) / (dx + 1e-3)) < 5e-3))

    # fused kNN+gather+edge features
    from sp_gan_tpu.ops.pallas.knn import knn_edge_pallas, knn_pallas_blocked
    from sp_gan_tpu.ops.edge import edge_features as ef
    x = jax.random.normal(key, (4, 2048, 64))
    idx_ref = knn_indices(x, 10)
    ee_ref = ef(x, 10, idx=idx_ref)
    for dt, tol in (("float32", 1e-5), ("bfloat16", 1e-2)):
        ee, idx = knn_edge_pallas(x, 10, dt)
        check(f"knn_edge idx {dt}",
              bool(jnp.mean((idx == idx_ref).astype(jnp.float32)) > 0.999))
        # oracle matches production mixed_edge semantics: cast x FIRST, then
        # gather/diff (bf16(a)-bf16(b), not bf16(a-b))
        oracle = ef(x.astype(ee.dtype), 10, idx=idx_ref)
        rel = jnp.max(jnp.abs(ee.astype(jnp.float32)
                              - oracle.astype(jnp.float32)))
        check(f"knn_edge ee {dt}", bool(rel < tol))
        # diff-only variant (EdgeBlock's production path): ee[..., C:]
        dee, didx = knn_edge_pallas(x, 10, dt, diff_only=True)
        check(f"knn_edge diff idx {dt}",
              bool(jnp.mean((didx == idx_ref).astype(jnp.float32)) > 0.999))
        drel = jnp.max(jnp.abs(dee.astype(jnp.float32)
                               - oracle[..., 64:].astype(jnp.float32)))
        check(f"knn_edge diff {dt}", bool(drel < tol))

    # banded (windowed) fused kNN+gather — the --knn_mode approx kernel
    from sp_gan_tpu.ops.approx_knn import knn_indices_window
    from sp_gan_tpu.ops.pallas.knn import knn_edge_window_pallas
    x = jax.random.normal(key, (4, 2048, 64))
    W = 256
    idx_ref = knn_indices_window(x, 10, window=W)
    ee_ref = ef(x, 10, idx=idx_ref)
    eew, idxw = knn_edge_window_pallas(x, 10, W, "float32")
    check("knn_edge_window idx exact",
          bool(jnp.mean((idxw == idx_ref).astype(jnp.float32)) > 0.999))
    rel = jnp.max(jnp.abs(eew - ee_ref))
    check("knn_edge_window ee", bool(rel < 1e-4))
    # packed selection: sets may differ from exact by near-tie swaps inside
    # a quantization bucket (2^bits ulps; bits = ceil(log2 wtot)). Verify
    # the CONTRACT — every swapped-in neighbor's distance is within the
    # bucket of the swapped-out one — not raw agreement (a 0.999 agreement
    # threshold mis-fails legitimate bucket ties; audited 2026-08-19:
    # 0.44% rows swap, max relative gap 7.8e-5 vs bound 2.4e-4).
    _, idxp = knn_edge_window_pallas(x, 10, W, "float32",
                                     select_mode="packed")
    xn = np.asarray(x, np.float64)
    dfull = ((xn ** 2).sum(-1)[:, :, None]
             - 2 * np.einsum("bnc,bmc->bnm", xn, xn)
             + (xn ** 2).sum(-1)[:, None, :])
    bits = max((256 + 2 * W - 1).bit_length(), 1)
    bound = 2.0 ** (bits - 23) * 2
    ip, ir = np.asarray(idxp), np.asarray(idx_ref)
    max_rel = 0.0
    for b in range(ip.shape[0]):
        for r in range(ip.shape[1]):
            added = sorted(set(ip[b, r]) - set(ir[b, r]))
            dropped = sorted(set(ir[b, r]) - set(ip[b, r]))
            for a_, d_ in zip(sorted(dfull[b, r, added]),
                              sorted(dfull[b, r, dropped])):
                max_rel = max(max_rel, abs(a_ - d_) / max(d_, 1e-9))
    check(f"knn_edge_window idx packed (max swap gap {max_rel:.1e})",
          max_rel <= bound)
    deew, didxw = knn_edge_window_pallas(x, 10, W, "bfloat16",
                                         diff_only=True)
    check("knn_edge_window diff idx bf16",
          bool(jnp.mean((didxw == idx_ref).astype(jnp.float32)) > 0.999))
    oracle_w = ef(x.astype(jnp.bfloat16), 10, idx=idx_ref)
    drel = jnp.max(jnp.abs(deew.astype(jnp.float32)
                           - oracle_w[..., 64:].astype(jnp.float32)))
    check("knn_edge_window diff bf16", bool(drel < 1e-2))

    # blocked large-N kNN
    xb = jax.random.normal(key, (2, 16384, 3))
    ib, db = knn_pallas_blocked(xb, 10)
    ix2, dx2 = knn_indices(xb, 10, return_dists=True)
    check("knn_blocked idx N=16384",
          bool(jnp.mean((ib == ix2).astype(jnp.float32)) > 0.999))

    # Chamfer
    x = jax.random.normal(key, (4, 2048, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 2048, 3))
    d1p, i1p, d2p, i2p = _chamfer_pallas_raw(x, y)
    d = pairwise_sqdist(x, y)
    check("chamfer d1", bool(jnp.max(jnp.abs(d1p - jnp.min(d, -1))) < 1e-3))
    check("chamfer d2", bool(jnp.max(jnp.abs(d2p - jnp.min(d, -2))) < 1e-3))
    check("chamfer i1", bool(jnp.mean(
        (i1p == jnp.argmin(d, -1)).astype(jnp.float32)) > 0.999))

    # scatter-add (bf16-MXU products like the XLA one-hot path -> relative
    # tolerance)
    g = jax.random.normal(key, (2, 4096, 128))
    idx = jax.random.randint(key, (2, 4096), 0, 2048)
    out = scatter_add_pallas(g, idx, 2048)
    oracle = jnp.zeros((2, 2048, 128)).at[
        jnp.arange(2)[:, None], idx].add(g)
    rel = jnp.max(jnp.abs(out - oracle) / (jnp.abs(oracle) + 1.0))
    check("scatter_add", bool(rel < 2e-2))

    # native-shape diff-edge backward (scatter + central term in one kernel)
    from sp_gan_tpu.ops.pallas.scatter import scatter_diff_bwd_pallas
    B, N, k, C = 2, 2048, 10, 64
    dd = jax.random.normal(key, (B, N, k, C))
    sidx = jax.random.randint(key, (B, N, k), 0, N)
    d_x = scatter_diff_bwd_pallas(dd, sidx)
    oracle = jnp.zeros((B, N, C)).at[
        jnp.arange(B)[:, None], sidx.reshape(B, N * k)].add(
        dd.reshape(B, N * k, C)) - jnp.sum(dd, axis=2)
    rel = jnp.max(jnp.abs(d_x - oracle) / (jnp.abs(oracle) + 1.0))
    check("scatter_diff_bwd f32", bool(rel < 1e-4))
    d_xb = scatter_diff_bwd_pallas(dd.astype(jnp.bfloat16), sidx)
    oracleb = jnp.zeros((B, N, C)).at[
        jnp.arange(B)[:, None], sidx.reshape(B, N * k)].add(
        dd.astype(jnp.bfloat16).astype(jnp.float32).reshape(B, N * k, C)) \
        - jnp.sum(dd.astype(jnp.bfloat16).astype(jnp.float32), axis=2)
    rel = jnp.max(jnp.abs(d_xb - oracleb) / (jnp.abs(oracleb) + 1.0))
    check("scatter_diff_bwd bf16", bool(rel < 2e-2))

    # VMEM-resident EMD auction vs scipy Hungarian (eps-optimality bound)
    from scipy.optimize import linear_sum_assignment
    from sp_gan_tpu.ops.pairwise import pairwise_sqdist as psq
    from sp_gan_tpu.ops.pallas.auction import auction_assignment_pallas
    import numpy as _np
    rngh = _np.random.default_rng(3)
    na = 256
    a1 = jnp.asarray(rngh.standard_normal((2, na, 3)).astype(_np.float32) * .3)
    a2 = jnp.asarray(rngh.standard_normal((2, na, 3)).astype(_np.float32) * .3)
    dm = psq(a1, a2)
    for mode in ("jacobi", "blockgs", "blockgs_hbm"):
        asg = _np.asarray(auction_assignment_pallas(
            dm, eps=0.002, iters=10000, mode=mode,
            block_w=64 if mode.startswith("blockgs") else 256))
        ok = True
        for b in range(2):
            r, c = linear_sum_assignment(_np.asarray(dm)[b])
            opt = _np.asarray(dm)[b][r, c].sum()
            got = _np.asarray(dm)[b][_np.arange(na), asg[b]].sum()
            ok &= (len(set(asg[b])) == na) \
                and (got <= opt + na * 0.002 + 1e-4)
        check(f"auction[{mode}] eps-optimal n=256", bool(ok))

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
