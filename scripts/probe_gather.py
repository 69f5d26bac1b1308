"""Probe which gather shapes Mosaic lowers on this TPU + their throughput.

Decides the round-2 Pallas march design:
  A. take_along_axis axis=0, idx same shape as src      (sublane dyn gather)
  B. take_along_axis axis=0, src more sublanes than idx (table gather)
  C. 1D flat jnp.take inside kernel
  D. row gather src[C3,8] indexed by [TILE] i32 (the round-1 blocker)
  E. scalar fori_loop of dynamic-slice rows (always lowers; how slow?)
Also measures plain-XLA gather throughput for the same access pattern, the
march's per-step fetch (9 f32 per lane from a [C^3,9] table).
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), "jax", jax.__version__, flush=True)

TILE = 1024


def bench(f, *args, iters=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def try_case(name, fn):
    try:
        dt = fn()
        print(f"PASS {name}: {dt*1e6:.1f} us", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


# ---- A: equal-shape take_along_axis axis=0 --------------------------------
def case_a():
    src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.zeros((8, 128), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    return bench(f, src, idx)


# ---- B: src [4096,128], idx [8,128], axis=0 --------------------------------
def case_b():
    src = jnp.arange(4096 * 128, dtype=jnp.float32).reshape(4096, 128)
    idx = jnp.full((8, 128), 77, jnp.int32)

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    return bench(f, src, idx)


# ---- B2: bigger src [250047 rounded, 128]? too big for VMEM — skip ---------

# ---- C: 1D flat take inside kernel -----------------------------------------
def case_c():
    src = jnp.arange(65536, dtype=jnp.float32)
    idx = jnp.arange(TILE, dtype=jnp.int32) * 7 % 65536

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(s_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((TILE,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    return bench(f, src, idx)


# ---- D: row gather [C3,8] by [TILE] ----------------------------------------
def case_d():
    c3 = 63 ** 3
    src = jnp.ones((c3, 8), jnp.float32)
    idx = jnp.arange(TILE, dtype=jnp.int32) * 13 % c3

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = s_ref[i_ref[:]]

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((TILE, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    return bench(f, src, idx)


# ---- D2: same but src in VMEM ----------------------------------------------
def case_d2():
    c3 = 63 ** 3
    src = jnp.ones((c3, 8), jnp.float32)
    idx = jnp.arange(TILE, dtype=jnp.int32) * 13 % c3

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = s_ref[i_ref[:]]

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((TILE, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    return bench(f, src, idx)


# ---- E: scalar fori_loop over dynamic slices --------------------------------
def case_e():
    c3 = 63 ** 3
    src = jnp.ones((c3, 8), jnp.float32)
    idx = jnp.arange(TILE, dtype=jnp.int32) * 13 % c3

    def k(s_ref, i_ref, o_ref, sidx_ref):
        sidx_ref[:] = i_ref[:]

        def body(r, _):
            o_ref[pl.ds(r, 1), :] = s_ref[pl.ds(sidx_ref[r], 1), :]
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((TILE, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((TILE,), jnp.int32)])(s, i))
    return bench(f, src, idx)


# ---- X: plain XLA gather throughput (the march's per-step fetch) ------------
def case_x():
    c3 = 128 ** 3
    src = jnp.ones((c3, 9), jnp.float32)
    r = 1 << 20
    idx = (jnp.arange(r, dtype=jnp.int32) * 2654435761) % c3

    @jax.jit
    def f(s, i):
        return jnp.sum(s[i], axis=0)

    dt = bench(f, src, idx, iters=20)
    gbps = r * 36 / dt / 1e9
    print(f"XLA row-gather [2^20 rays x 9f32 from 128^3]: {dt*1e3:.2f} ms"
          f" = {gbps:.1f} GB/s effective", flush=True)
    return dt


# ---- X2: XLA flat 1-float gather -------------------------------------------
def case_x2():
    c3 = 128 ** 3 * 9
    src = jnp.ones((c3,), jnp.float32)
    r = 1 << 20
    idx = (jnp.arange(r, dtype=jnp.int32) * 2654435761) % c3

    @jax.jit
    def f(s, i):
        return jnp.sum(jnp.take(s, i))

    dt = bench(f, src, idx, iters=20)
    print(f"XLA flat-gather [2^20 x 1f32]: {dt*1e3:.2f} ms = "
          f"{r*4/dt/1e9:.1f} GB/s effective", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "b", "c", "d", "d2", "e", "x", "x2"]
    cases = dict(a=case_a, b=case_b, c=case_c, d=case_d, d2=case_d2,
                 e=case_e, x=case_x, x2=case_x2)
    for w in which:
        try_case(w, cases[w])
