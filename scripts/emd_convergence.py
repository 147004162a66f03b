#!/usr/bin/env python
"""EMD auction convergence audit (VERDICT r1 #8).

The reference's test regime is eps=0.002 / 10000 iterations
(`/root/reference/metrics/emd/README.md:7-8`); our `compute_all_metrics`
needs a defensible iteration default at N=2048. Two measurements:

1. Small-n exactness: auction cost vs scipy Hungarian optimum at n=256 for
   several iteration counts (the bound the auction should approach).
2. N=2048 self-convergence: EMD estimates on shape pairs at increasing
   iteration counts, relative change vs the 10000-iter reference value, and
   the assignment's matched fraction (auction leaves unassigned rows to the
   forced final pass if it hasn't converged).

Run on TPU: python scripts/emd_convergence.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sp_gan_tpu.ops.emd import emd_auction

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. Hungarian bound at n=256 ----
    from scipy.optimize import linear_sum_assignment
    n = 256
    a = jnp.asarray(rng.standard_normal((4, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, n, 3)).astype(np.float32))
    d = np.asarray(jnp.sum(
        (np.asarray(a)[:, :, None, :] - np.asarray(b)[:, None, :, :]) ** 2,
        axis=-1))
    hung = []
    for i in range(4):
        r, c = linear_sum_assignment(d[i])
        hung.append(d[i][r, c].mean())
    hung = np.array(hung)
    print(f"n={n} Hungarian optimum (mean sqdist): {hung.mean():.6f}")
    for iters in (128, 512, 2000, 10000):
        cost, _ = emd_auction(a, b, 0.002, iters)
        cost = np.asarray(jnp.mean(cost, axis=1))
        gap = (cost / hung - 1.0)
        print(f"  iters={iters:>6}: cost {cost.mean():.6f} "
              f"(+{100*gap.mean():.3f}% vs optimal)", flush=True)

    # ---- 2. self-convergence at N=2048 ----
    N = 2048
    # shape-like clouds: smooth deformations of a sphere (closer to the
    # metric's real regime than iid gaussians)
    def cloud(seed):
        g = np.random.default_rng(seed)
        x = g.standard_normal((N, 3))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return (x * (1 + 0.3 * np.sin(3 * x[:, :1]))).astype(np.float32)

    A = jnp.asarray(np.stack([cloud(i) for i in range(8)]))
    B = jnp.asarray(np.stack([cloud(100 + i) for i in range(8)]))
    results = {}
    for iters in (128, 256, 512, 1024, 2000, 4000, 10000):
        t0 = time.perf_counter()
        cost, _ = emd_auction(A, B, 0.002, iters)
        cost = np.asarray(jnp.mean(cost, axis=1))
        jax.block_until_ready(cost)
        dt = time.perf_counter() - t0
        results[iters] = cost
        print(f"N={N} iters={iters:>6}: mean EMD {cost.mean():.6f} "
              f"({dt:.1f}s for 8 pairs)", flush=True)
    ref = results[10000]
    print("\nrelative deviation vs iters=10000:")
    for iters, cost in results.items():
        rel = np.abs(cost / ref - 1.0)
        print(f"  iters={iters:>6}: mean {100*rel.mean():.3f}%  "
              f"max {100*rel.max():.3f}%", flush=True)


if __name__ == "__main__":
    main()
