#!/usr/bin/env python
"""Large-N auction sweep (VERDICT r3 #8): blockgs w/phase tuning beyond the
N=2048 regime it was tuned at.

Measures solves/s at the metric regime (eps=0.002, iters=10000 — the
reference test protocol, /root/reference/metrics/emd/README.md:7-8) for:
  * N=2048 blockgs w=64            (r3 default — the reference point)
  * N=4096 blockgs  w in {64,128}  (VMEM ceiling probe: 64 MB matrix)
  * N=4096 blockgs_hbm w in {64,128,256}
  * N=8192 blockgs_hbm w in {64,128,256}   (256 MB matrix, HBM-resident)

Every solve is validated as a bijection; cross-mode assignment costs are
compared (same N*eps optimality bound => total costs must agree within
2*N*eps). Prints one JSON line per measurement. Run with the TPU free.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_case(d, mode, w, eps, iters, phases):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sp_gan_tpu.ops.pallas.auction import auction_assignment_pallas

    B = d.shape[0]
    # The jitted fn takes a per-call scalar mixed into the distances so
    # every timed dispatch has DISTINCT inputs: the first version of this
    # sweep re-dispatched identical args and the relay served memoized
    # results (N=2048 "117737 solves/s" — see the _r1dispatch artifact).
    # The scalar add is one HBM pass, negligible vs a multi-second solve,
    # and a 1e-6 jitter on squared distances cannot change throughput.
    f = jax.jit(lambda dd, s: auction_assignment_pallas(
        dd + s * 1e-6, eps, iters, phases=phases, mode=mode, block_w=w))
    asg = np.asarray(f(d, jnp.float32(0.0)))  # warm compile
    # Time by materializing EVERY dispatch: on the axon relay
    # jax.block_until_ready does NOT wait for independent dispatches —
    # only a host fetch forces the round trip (two prior versions of this
    # sweep measured enqueue overhead: 117737 then 83714 "solves/s" at
    # N=2048 vs 53/s materialized). Chained-state loops (bench.py) are
    # unaffected; independent-dispatch timing must fetch each result.
    # The per-call scalar keeps inputs distinct across reps regardless.
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        asg = np.asarray(f(d, jnp.float32(1.0 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    uniq = min(len(set(asg[i])) for i in range(B))
    dn = np.asarray(d)
    cost = float(np.mean([dn[i][np.arange(dn.shape[1]), asg[i]].sum()
                          for i in range(B)]))
    return {"solves_per_sec": round(B / dt, 2), "min_uniq": uniq,
            "mean_cost": round(cost, 4)}


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax  # noqa: F401
    import jax.numpy as jnp

    from sp_gan_tpu.data import SyntheticDataset
    from sp_gan_tpu.ops.pairwise import pairwise_sqdist

    eps, iters, phases = 0.002, 10000, 4
    cases = [
        (2048, "blockgs", 64, 8),
        (4096, "blockgs", 64, 4),
        (4096, "blockgs", 128, 4),
        (4096, "blockgs_hbm", 64, 4),
        (4096, "blockgs_hbm", 128, 4),
        (4096, "blockgs_hbm", 256, 4),
        (8192, "blockgs_hbm", 64, 2),
        (8192, "blockgs_hbm", 128, 2),
        (8192, "blockgs_hbm", 256, 2),
    ]
    for N, mode, w, B in cases:
        data = SyntheticDataset(n_items=2 * B, n_points=N).data
        d = pairwise_sqdist(jnp.asarray(data[:B]), jnp.asarray(data[B:]))
        label = f"auction N={N} {mode} w={w} ({B} pairs)"
        try:
            out = run_case(d, mode, w, eps, iters, phases)
            print(json.dumps({"measure": label, **out}), flush=True)
        except Exception as e:  # noqa: BLE001 — record the ceiling, move on
            print(json.dumps({"measure": label, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
