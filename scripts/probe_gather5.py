"""In-kernel gather throughput: loop the gather INSIDE one pallas_call to
amortize the ~0.6 ms axon dispatch.  Each case does ITERS gathers of a
[TILE] index vector, mutating the indices between iterations so nothing
folds away.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
ITERS = 256


def timeit(f, *args, iters=5):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def report(name, dt, rows_per_call):
    print(f"{name:52s} {dt*1e3:8.2f} ms  {rows_per_call/dt/1e6:8.1f} "
          f"M rows/s", flush=True)


# -- K1: in-kernel lane gather (axis=1), [8,128] tiles, 1024 idx/iter --------
def k1():
    S, L = 8, 128
    src = jnp.asarray(rng.random((S, L), np.float32))
    idx = jnp.asarray(rng.integers(0, L, (S, L)), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        def body(t, acc):
            i = (i_ref[:] + t) & (L - 1)
            return acc + jnp.take_along_axis(s_ref[:], i, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((S, L), jnp.float32))

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    report("K1 lane-gather [8,128] x256 in-kernel", timeit(f, src, idx),
           S * L * ITERS)


# -- K1b: bigger tile [256,128] lane gather ----------------------------------
def k1b():
    S, L = 256, 128
    src = jnp.asarray(rng.random((S, L), np.float32))
    idx = jnp.asarray(rng.integers(0, L, (S, L)), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        def body(t, acc):
            i = (i_ref[:] + t) & (L - 1)
            return acc + jnp.take_along_axis(s_ref[:], i, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((S, L), jnp.float32))

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    report("K1b lane-gather [256,128] x256 in-kernel", timeit(f, src, idx),
           S * L * ITERS)


# -- K2: P5 composite, arbitrary K=1024 table, [64,128] outputs --------------
def k2():
    S, L = 64, 128
    src = jnp.asarray(rng.random((8, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, (S, L)), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        def body(t, acc):
            ii = (i_ref[:] + t) & 1023
            r = ii >> 7
            c = ii & 127
            g = jnp.zeros((S, L), jnp.float32)
            for k_ in range(8):
                row = jnp.broadcast_to(s_ref[k_, :][None, :], (S, L))
                gk = jnp.take_along_axis(row, c, axis=1)
                g = jnp.where(r == k_, gk, g)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((S, L), jnp.float32))

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    report("K2 composite K=1024 [64,128] x256 in-kernel", timeit(f, src, idx),
           S * L * ITERS)


# -- K3: scalar fori_loop row slices, [2048] rows/iter, 8-wide ---------------
def k3():
    n_rows = 65536
    tile = 2048
    src = jnp.asarray(rng.random((n_rows, 8), np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, tile), jnp.int32)
    inner = 16  # gathers per call = inner * tile

    def k(i_ref, s_ref, o_ref):
        def outer(t, _):
            def body(r, _):
                o_ref[pl.ds(r, 1), :] = s_ref[pl.ds((i_ref[r] + t)
                                                    % n_rows, 1), :]
                return 0
            jax.lax.fori_loop(0, tile, body, 0)
            return 0
        jax.lax.fori_loop(0, inner, outer, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    f = jax.jit(lambda i, s: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((tile, 8), jnp.float32),
        grid_spec=gs)(i, s))
    report("K3 scalar-loop rows x8 [2048x16] in-kernel",
           timeit(f, idx, src), tile * inner)


# -- K4: one-hot MXU K=512, [1024] idx/iter ----------------------------------
def k4():
    K = 512
    tile = 1024
    src = jnp.asarray(rng.random((K, 8), np.float32))
    idx = jnp.asarray(rng.integers(0, K, tile), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        sb = s_ref[:].astype(jnp.bfloat16)

        def body(t, acc):
            ids = (i_ref[:] + t) & (K - 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile, K), 1)
            oh = (cols == ids[:, None]).astype(jnp.bfloat16)
            return acc + jnp.dot(oh, sb, preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((tile, 8), jnp.float32))

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((tile, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    report("K4 one-hot MXU K=512 [1024x8] x256 in-kernel",
           timeit(f, src, idx), tile * ITERS)


# -- K5: XLA reference at same total row count --------------------------------
def k5():
    T = 128 ** 3
    R = 1 << 20
    tbl = jnp.asarray(rng.random((T, 8), np.float32))
    idx = jnp.asarray(rng.integers(0, T, R), jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    report("K5 XLA f32[T,8] 1M (reference)", timeit(f, tbl, idx), R)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, fn in [("K1", k1), ("K1b", k1b), ("K2", k2), ("K3", k3),
                     ("K4", k4), ("K5", k5)]:
        try:
            fn()
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
