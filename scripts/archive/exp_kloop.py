#!/usr/bin/env python
"""Experiment: can the EdgeBlock kernels' per-j loops become single matmuls?

Tests Mosaic support + speed for:
  (a) k-loop of [cs,F]@[F,F] matmuls (current)
  (b) one [cs,F]@[F,k*F] matmul + lane-split reshape [cs,k*F]->[cs,k,F]
  (c) lane-merge reshape [cs,k,F]->[cs,k*F] + one [cs,k*F]@[k*F,F] matmul

Each variant computes d_u = d_out @ wout[j].T for all j (b) or
out = sum_j u[:,j,:] @ wout[j] (a, c) inside a grid+chunk kernel shaped like
the real sweeps. Correctness vs XLA einsum + device wall time over a serial
loop.
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

B, N, k, F = 24, 2048, 10, 128
TQ, CS = 1024, 256
CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def kern_a(u_ref, w_ref, o_ref):
    def body(ci, _):
        u = u_ref[0, pl.ds(ci * CS, CS)]          # [CS, k, F]
        acc = jnp.zeros((CS, F), jnp.float32)
        for j in range(k):
            acc += jax.lax.dot_general(
                u[:, j, :], w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(ci * CS, CS)] = acc
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


def kern_c(u_ref, wflat_ref, o_ref):
    def body(ci, _):
        u = u_ref[0, pl.ds(ci * CS, CS)]          # [CS, k, F]
        uf = u.reshape(CS, k * F)                 # lane merge (?)
        acc = jax.lax.dot_general(
            uf, wflat_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(ci * CS, CS)] = acc
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


def kern_b(d_ref, wtflat_ref, o_ref):
    def body(ci, _):
        d = d_ref[0, pl.ds(ci * CS, CS)]          # [CS, F]
        duf = jax.lax.dot_general(
            d, wtflat_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [CS, k*F]
        du = duf.reshape(CS, k, F)                # lane split (?)
        o_ref[0, pl.ds(ci * CS, CS)] = du
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


def run(name, fn, args, out_shape, oracle):
    try:
        call = jax.jit(lambda *a: pl.pallas_call(
            fn, grid=(B, N // TQ),
            in_specs=[pl.BlockSpec((1, TQ) + a[0].shape[2:],
                                   lambda b, t: (b, t) + (0,) * (a[0].ndim - 2),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(x.shape, lambda b, t, _s=x.shape:
                                   (0,) * len(_s), memory_space=pltpu.VMEM)
                      for x in a[1:]],
            out_specs=pl.BlockSpec((1, TQ) + out_shape[2:],
                                   lambda b, t: (b, t) + (0,) * (len(out_shape) - 2),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=CP)(*a))
        out = call(*args)
        err = float(jnp.max(jnp.abs(out - oracle)) /
                    (jnp.max(jnp.abs(oracle)) + 1e-8))
        t0 = time.perf_counter()
        for _ in range(30):
            out = call(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name}: {dt:.2f} ms  rel-err {err:.1e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED — {str(e)[:300]}", flush=True)


key = jax.random.PRNGKey(0)
u = jax.random.normal(key, (B, N, k, F), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(1), (k, F, F), jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(2), (B, N, F), jnp.float32)

oracle_out = jnp.einsum("bnkf,kfg->bng", u, w)
oracle_du = jnp.einsum("bng,kfg->bnkf", d, w)

run("a k-loop conv_out ", kern_a, (u, w), (B, N, F), oracle_out)
run("c lane-merge matmul", kern_c,
    (u, w.reshape(k * F, F)), (B, N, F), oracle_out)
# M[g, j*F+f] = wout[j, f, g]
run("b lane-split matmul", kern_b,
    (d, jnp.transpose(w, (2, 0, 1)).reshape(F, k * F)),
    (B, N, k, F), oracle_du)
