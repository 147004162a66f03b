#!/usr/bin/env python
"""Prototype: diff-edge backward scatter consuming [B,N,k,C] + [B,N,k]
natively (no N*k reshapes -> no layout copies), central term fused.

d_x[b,p,:] = sum_{(q,j): idx[b,q,j]=p} d_diff[b,q,j,:] - sum_j d_diff[b,p,j,:]

Compares against the XLA formula and times both on the chip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sp_gan_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dd_ref, idx_ref, out_ref, *, T: int, k: int, c: int):
    t = pl.program_id(1)
    s = pl.program_id(2)
    cols = t * T + jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    acc = jnp.zeros((T, c), jnp.float32)
    f32_in = dd_ref.dtype == jnp.float32
    for j in range(k):
        idx_j = idx_ref[0, :, j]                            # [T] sublanes
        g_j = dd_ref[0, :, j, :]                            # [T, C]
        oh = (idx_j[:, None] == cols).astype(jnp.bfloat16)  # [T_src, T_tgt]
        mm = lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        if f32_in:
            gf = g_j
            hi = gf.astype(jnp.bfloat16)
            r1 = gf - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += mm(oh, hi) + mm(oh, mid) + mm(oh, lo)
        else:
            acc += mm(oh, g_j.astype(jnp.bfloat16))

    @pl.when(s == 0)
    def _():
        out_ref[0] = acc

    @pl.when(s != 0)
    def _():
        out_ref[0] += acc

    @pl.when(s == t)
    def _():
        out_ref[0] -= jnp.sum(dd_ref[0].astype(jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("t_tile",))
def scatter_diff_bwd(d_diff, idx, t_tile=512):
    B, N, k, C = d_diff.shape
    T = t_tile
    while N % T:
        T //= 2
    kernel = functools.partial(_kernel, T=T, k=k, c=C)
    return pl.pallas_call(
        kernel,
        grid=(B, N // T, N // T),
        in_specs=[
            pl.BlockSpec((1, T, k, C), lambda b, t, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, k), lambda b, t, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * k * N * C, transcendentals=0,
            bytes_accessed=B * N * k * C * d_diff.dtype.itemsize
            * (N // T) + B * N * C * 4),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(d_diff, idx.astype(jnp.int32))


def xla_ref(d_diff, idx):
    B, N, k, C = d_diff.shape
    oh = jax.nn.one_hot(idx.reshape(B, N * k), N, dtype=d_diff.dtype, axis=-1)
    s = jnp.einsum("bsn,bsc->bnc", oh,
                   d_diff.reshape(B, N * k, C)).astype(jnp.float32)
    return s - jnp.sum(d_diff, axis=2).astype(jnp.float32)


def timeit(fn, *args, iters=8, reps=4):
    def call():
        def body(c, _):
            o = fn(*args)
            return c + o[0, 0, 0] * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    call = jax.jit(call)
    np.asarray(call())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters / reps * 1e3


def main():
    B, N, k, C = 24, 2048, 10, 64
    key = jax.random.PRNGKey(0)
    d_diff = jax.random.normal(key, (B, N, k, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, N, k), 0, N)
    for dt in (jnp.bfloat16, jnp.float32):
        dd = d_diff.astype(dt)
        got = np.asarray(scatter_diff_bwd(dd, idx))
        want = np.asarray(xla_ref(dd, idx))
        err = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
        print(f"{dt.__name__}: rel err {err:.2e}")
        for T in (256, 512, 1024, 2048):
            try:
                ms = timeit(functools.partial(scatter_diff_bwd, t_tile=T),
                            dd, idx)
                print(f"  T={T}: {ms:.2f} ms/call")
            except Exception as e:
                print(f"  T={T}: FAIL {str(e)[:120]}")
    # current production path for comparison
    from sp_gan_tpu.ops.edge import scatter_rows
    def cur(dd, idx):
        s = scatter_rows(dd.reshape(B, N * k, C), idx.reshape(B, N * k), N)
        return s.astype(jnp.float32) - jnp.sum(dd, axis=2).astype(jnp.float32)
    print("current XLA+scatter_add path:",
          f"{timeit(cur, d_diff.astype(jnp.bfloat16), idx):.2f} ms/call")


if __name__ == "__main__":
    main()
