#!/usr/bin/env python
"""Experiment 2: isolate where the EdgeBlock sweep time goes.

  floor   — read tile, write zeros (pipeline/copy floor)
  a32/abf — k-loop conv_out, f32 vs bf16
  cbf     — lane-merge single matmul, bf16
  flatbf  — edge tensor stored FLAT [B, N*k, F] (no padded k sublane dim in
            the block), chunk read [cs*k, F], major-split to [cs,k,F], k-loop
  nofori  — no inner loop: tq=cs=256 grid (B, 8), k-loop (grid vs fori cost)
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
CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def bench(name, call, args, oracle=None):
    try:
        out = call(*args)
        err = -1.0
        if oracle is not None:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - oracle)) /
                        (jnp.max(jnp.abs(oracle)) + 1e-8))
        t0 = time.perf_counter()
        for _ in range(30):
            out = call(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name}: {dt:.2f} ms  rel-err {err:.1e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED — {str(e)[:250]}", flush=True)


def mk(kern, ushape, ublock, wshapes, oshape, oblock, grid, dt=jnp.float32):
    full = lambda s: pl.BlockSpec(s, lambda b, t, _s=s: (0,) * len(_s),
                                  memory_space=pltpu.VMEM)
    return jax.jit(lambda *a: pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec(ublock,
                               lambda b, t: (b, t) + (0,) * (len(ublock) - 2),
                               memory_space=pltpu.VMEM)] +
                 [full(s) for s in wshapes],
        out_specs=pl.BlockSpec(oblock,
                               lambda b, t: (b, t) + (0,) * (len(oblock) - 2),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        compiler_params=CP)(*a))


key = jax.random.PRNGKey(0)
u32 = jax.random.normal(key, (B, N, k, F), jnp.float32)
w32 = jax.random.normal(jax.random.PRNGKey(1), (k, F, F), jnp.float32)
ubf, wbf = u32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
uflat = ubf.reshape(B, N * k, F)
oracle = jnp.einsum("bnkf,kfg->bng", u32, w32)
oraclebf = jnp.einsum("bnkf,kfg->bng", ubf, wbf,
                      preferred_element_type=jnp.float32)

TQ, CS = 1024, 256


def k_floor(u_ref, o_ref):
    def body(ci, _):
        u = u_ref[0, pl.ds(ci * CS, CS)]
        o_ref[0, pl.ds(ci * CS, CS)] = jnp.sum(
            u.astype(jnp.float32), axis=1)
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


def mk_kloop(cs, tq):
    def kern(u_ref, w_ref, o_ref):
        def body(ci, _):
            u = u_ref[0, pl.ds(ci * cs, cs)]
            acc = jnp.zeros((cs, F), jnp.float32)
            for j in range(k):
                acc += jax.lax.dot_general(
                    u[:, j, :], w_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(ci * cs, cs)] = acc
            return 0
        jax.lax.fori_loop(0, tq // cs, body, 0)
    return kern


def kern_cbf(u_ref, wf_ref, o_ref):
    def body(ci, _):
        u = u_ref[0, pl.ds(ci * CS, CS)]
        uf = u.reshape(CS, k * F)
        o_ref[0, pl.ds(ci * CS, CS)] = jax.lax.dot_general(
            uf, wf_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


def kern_flat(uf_ref, w_ref, o_ref):
    def body(ci, _):
        u = uf_ref[0, pl.ds(ci * CS * k, CS * k)]      # [cs*k, F]
        u3 = u.reshape(CS, k, F)
        acc = jnp.zeros((CS, F), jnp.float32)
        for j in range(k):
            acc += jax.lax.dot_general(
                u3[:, j, :], w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(ci * CS, CS)] = acc
        return 0
    jax.lax.fori_loop(0, TQ // CS, body, 0)


bench("floor (read+reduce) ", mk(k_floor, None, (1, TQ, k, F), [],
                                 (B, N, F), (1, TQ, F), (B, N // TQ)),
      (ubf,))
bench("a32 k-loop          ", mk(mk_kloop(CS, TQ), None, (1, TQ, k, F),
                                 [w32.shape], (B, N, F), (1, TQ, F),
                                 (B, N // TQ)), (u32, w32), oracle)
bench("abf k-loop          ", mk(mk_kloop(CS, TQ), None, (1, TQ, k, F),
                                 [wbf.shape], (B, N, F), (1, TQ, F),
                                 (B, N // TQ)), (ubf, wbf), oraclebf)
bench("cbf lane-merge      ", mk(kern_cbf, None, (1, TQ, k, F),
                                 [(k * F, F)], (B, N, F), (1, TQ, F),
                                 (B, N // TQ)),
      (ubf, wbf.reshape(k * F, F)), oraclebf)
bench("flatbf k-loop       ", mk(kern_flat, None, (1, TQ * k, F),
                                 [wbf.shape], (B, N, F), (1, TQ, F),
                                 (B, N // TQ)), (uflat, wbf), oraclebf)
bench("nofori abf tq=cs=256", mk(mk_kloop(256, 256), None, (1, 256, k, F),
                                 [wbf.shape], (B, N, F), (1, 256, F),
                                 (B, N // 256)), (ubf, wbf), oraclebf)
