"""Round-2 probe: corner-table packing formats (XLA) + Pallas gather
mechanisms, all at 2^20 rays on the real chip.

probe_gather3 found row ALIGNMENT dominates: f32[T,9] (36 B) gathers at
40 M rows/s but f32[T,8] (32 B) at 124 M rows/s.  This probe picks the
production packing and measures what a Pallas kernel could do against it.
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

T = 128 ** 3
R = 1 << 20
rng = np.random.default_rng(0)
IDX = jnp.asarray(rng.integers(0, T, R), jnp.int32)


def timeit(f, *args, iters=10):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def report(name, dt, rows=R):
    print(f"{name:46s} {dt*1e3:8.2f} ms  {rows/dt/1e6:8.1f} M rows/s",
          flush=True)


def xla_cases():
    for ch, dt_ in [(8, jnp.float32), (16, jnp.float32), (8, jnp.bfloat16),
                    (16, jnp.bfloat16), (32, jnp.bfloat16)]:
        tbl = jnp.asarray(rng.random((T, ch), np.float32), dt_)
        f = jax.jit(lambda t, i: t[i])
        report(f"rows {dt_.__name__}[T,{ch}]", timeit(f, tbl, IDX))

    # paired: aligned row + separate flat accel
    tbl8 = jnp.asarray(rng.random((T, 8), np.float32))
    acc32 = jnp.asarray(rng.integers(0, 17, T), jnp.int32)
    acc8 = acc32.astype(jnp.int8)

    f = jax.jit(lambda t, a, i: (t[i], jnp.take(a, i)))
    report("f32[T,8] + i32 flat accel", timeit(f, tbl8, acc32, IDX))
    f = jax.jit(lambda t, a, i: (t[i], jnp.take(a, i)))
    report("f32[T,8] + i8 flat accel", timeit(f, tbl8, acc8, IDX))

    tbl8b = tbl8.astype(jnp.bfloat16)
    f = jax.jit(lambda t, a, i: (t[i], jnp.take(a, i)))
    report("bf16[T,8] + i32 flat accel", timeit(f, tbl8b, acc32, IDX))

    # accel folded into a bf16 channel (current fast path trick), 16-wide
    tbl16b = jnp.asarray(rng.random((T, 16), np.float32), jnp.bfloat16)
    f = jax.jit(lambda t, i: t[i])
    out = f(tbl16b, IDX)
    del out
    # i32 flat alone
    f = jax.jit(lambda a, i: jnp.take(a, i))
    report("i32 flat accel alone", timeit(f, acc32, IDX))

    # 4-point (2x2) sub-rows: two gathers of [T,4] vs one of [T,8]
    tbl4 = jnp.asarray(rng.random((T, 4), np.float32))
    f = jax.jit(lambda t, i: (t[i], t[jnp.minimum(i + 1, T - 1)]))
    report("2x f32[T,4] (split corner pair)", timeit(f, tbl4, IDX))


def pallas_cases():
    # -- P1: big equal-shape take_along_axis axis=0 (sublane gather) --------
    def p1():
        src = jnp.asarray(rng.random((512, 128), np.float32))
        idx = jnp.asarray(rng.integers(0, 512, (512, 128)), jnp.int32)

        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

        f = jax.jit(lambda s, i: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
        dt = timeit(f, src, idx, iters=100)
        report("P1 taa axis=0 [512,128] (64k vals)", dt, rows=512 * 128)

    # -- P2: take_along_axis axis=1 (lane gather) ----------------------------
    def p2():
        src = jnp.asarray(rng.random((512, 128), np.float32))
        idx = jnp.asarray(rng.integers(0, 128, (512, 128)), jnp.int32)

        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

        f = jax.jit(lambda s, i: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
        dt = timeit(f, src, idx, iters=100)
        report("P2 taa axis=1 [512,128] (64k vals)", dt, rows=512 * 128)

    # -- P3: scalar-prefetch idx + fori_loop row slices from VMEM table -----
    def p3():
        n_rows = 4096
        tile = 2048
        src = jnp.asarray(rng.random((n_rows, 128), np.float32))
        idx = jnp.asarray(rng.integers(0, n_rows, tile), jnp.int32)

        def k(i_ref, s_ref, o_ref):
            def body(r, _):
                o_ref[pl.ds(r, 1), :] = s_ref[pl.ds(i_ref[r], 1), :]
                return 0
            jax.lax.fori_loop(0, tile, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        f = jax.jit(lambda i, s: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((tile, 128), jnp.float32),
            grid_spec=gs)(i, s))
        dt = timeit(f, idx, src, iters=100)
        report("P3 scalar-loop rows [tile=2048]x128", dt, rows=tile)

    # -- P3b: same but narrow [*, 8] rows ------------------------------------
    def p3b():
        n_rows = 65536
        tile = 2048
        src = jnp.asarray(rng.random((n_rows, 8), np.float32))
        idx = jnp.asarray(rng.integers(0, n_rows, tile), jnp.int32)

        def k(i_ref, s_ref, o_ref):
            def body(r, _):
                o_ref[pl.ds(r, 1), :] = s_ref[pl.ds(i_ref[r], 1), :]
                return 0
            jax.lax.fori_loop(0, tile, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        f = jax.jit(lambda i, s: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((tile, 8), jnp.float32),
            grid_spec=gs)(i, s))
        dt = timeit(f, idx, src, iters=100)
        report("P3b scalar-loop rows [tile=2048]x8", dt, rows=tile)

    # -- P4: one-hot MXU gather, K=512 brick ---------------------------------
    def p4():
        K = 512
        tile = 1024
        src = jnp.asarray(rng.random((K, 8), np.float32))
        idx = jnp.asarray(rng.integers(0, K, tile), jnp.int32)

        def k(s_ref, i_ref, o_ref):
            ids = i_ref[:]                       # [tile]
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile, K), 1)
            oh = (cols == ids[:, None]).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(oh, s_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        f = jax.jit(lambda s, i: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((tile, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
        dt = timeit(f, src, idx, iters=100)
        report("P4 one-hot MXU K=512 [tile=1024]x8", dt, rows=tile)

    # -- P5: 8-static-row broadcast + axis-1 lane gather + select (K=1024) ---
    def p5():
        tile_s, tile_l = 64, 128                 # 8192 outputs
        src = jnp.asarray(rng.random((8, 128), np.float32))  # 1024-entry tbl
        idx = jnp.asarray(rng.integers(0, 1024, (tile_s, tile_l)), jnp.int32)

        def k(s_ref, i_ref, o_ref):
            r = i_ref[:] >> 7
            c = i_ref[:] & 127
            acc = jnp.zeros((tile_s, tile_l), jnp.float32)
            for k_ in range(8):
                row = s_ref[k_, :][None, :]      # [1,128] static row
                row_b = jnp.broadcast_to(row, (tile_s, tile_l))
                g = jnp.take_along_axis(row_b, c, axis=1)
                acc = jnp.where(r == k_, g, acc)
            o_ref[:] = acc

        f = jax.jit(lambda s, i: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((tile_s, tile_l), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
        dt = timeit(f, src, idx, iters=100)
        report("P5 8row-bcast+lane-gather K=1024 (8k vals)", dt,
               rows=tile_s * tile_l)

    for name, fn in [("P1", p1), ("P2", p2), ("P3", p3), ("P3b", p3b),
                     ("P4", p4), ("P5", p5)]:
        try:
            fn()
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    xla_cases()
    pallas_cases()
