#!/usr/bin/env python
"""Tune knn_edge_pallas (tq, dist-matmul precision) and scatter_add t_tile.

Times standalone kernels with a serial-dependency scan + device_get sync
(block_until_ready returns early through the device relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sp_gan_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(make_call, iters=6, reps=4):
    call = jax.jit(make_call())
    out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters / reps * 1e3


def main():
    from sp_gan_tpu.ops.pallas.knn import knn_edge_pallas
    from sp_gan_tpu.ops.pallas.scatter import scatter_add_pallas

    B, N, C, k = 24, 2048, 64, 10
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), jnp.float32)

    for tq in (128, 256, 512):
        def mk(tq=tq):
            def call():
                def body(c, _):
                    ee, idx = knn_edge_pallas(c, k, "bfloat16", tq=tq)
                    return c + idx.sum().astype(c.dtype) * 1e-30, None
                return jax.lax.scan(body, x, None, length=4)[0]
            return call
        print(f"knn_edge tq={tq}: {timeit(mk):.2f} ms/call", flush=True)

    g = jax.random.normal(jax.random.PRNGKey(1), (B, N * k, C),
                          jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(2), (B, N * k), 0, N)
    for tt in (128, 256, 512, 1024):
        def mk(tt=tt):
            def call():
                def body(c, _):
                    o = scatter_add_pallas(c, idx, N, t_tile=tt)
                    return c + o[0, 0, 0].astype(c.dtype) * 1e-30, None
                return jax.lax.scan(body, g, None, length=4)[0]
            return call
        print(f"scatter t_tile={tt}: {timeit(mk):.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
