"""Gather formulation bake-off on the TPU (drained timings).

The march is bound by XLA's gathered-rows/s (~44M/s measured), not HBM
bytes.  Which formulation maximizes rows/s?
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T = 128 ** 3
rng = np.random.default_rng(0)


def timeit(f, *args, iters=10):
    out = f(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def report(name, dt, rows, bytes_per_row):
    print(f"{name:42s} {dt*1e3:8.2f} ms  {rows/dt/1e6:8.1f} M rows/s  "
          f"{rows*bytes_per_row/dt/1e9:7.1f} GB/s", flush=True)


def run(r):
    idx = jnp.asarray(rng.integers(0, T, r), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, T // 8, r), jnp.int32)
    sub8 = jnp.asarray(rng.integers(0, 8, r), jnp.int32)

    tbl9 = jnp.asarray(rng.random((T, 9), np.float32))
    f = jax.jit(lambda t, i: t[i])
    report(f"[{r}] rows f32[T,9]", timeit(f, tbl9, idx), r, 36)

    tbl9b = tbl9.astype(jnp.bfloat16)
    f = jax.jit(lambda t, i: t[i])
    report(f"[{r}] rows bf16[T,9]", timeit(f, tbl9b, idx), r, 18)

    tbl8 = jnp.asarray(rng.random((T, 8), np.float32))
    f = jax.jit(lambda t, i: t[i])
    report(f"[{r}] rows f32[T,8]", timeit(f, tbl8, idx), r, 32)

    tbl1 = jnp.asarray(rng.random((T,), np.float32))
    f = jax.jit(lambda t, i: jnp.take(t, i))
    report(f"[{r}] flat f32 x1", timeit(f, tbl1, idx), r, 4)

    # 9 separate flat gathers (one per channel)
    tblT = jnp.asarray(rng.random((9, T), np.float32))

    @jax.jit
    def nine(t, i):
        return jnp.stack([jnp.take(t[c], i) for c in range(9)], -1)
    report(f"[{r}] 9x flat f32", timeit(nine, tblT, idx), r * 9, 4)

    # super-rows: [T/8, 72] then select 9 of 72 via take_along_axis
    tblS = jnp.asarray(rng.random((T // 8, 72), np.float32))

    @jax.jit
    def srow(t, hi, lo):
        rows = t[hi]                       # [r, 72]
        cols = lo[:, None] * 9 + jnp.arange(9)[None, :]
        return jnp.take_along_axis(rows, cols, axis=1)
    report(f"[{r}] super-rows f32[T/8,72]+select",
           timeit(srow, tblS, idx8, sub8), r, 36)

    # super-rows bf16 [T/8, 80]
    tblSb = jnp.asarray(rng.random((T // 8, 80), np.float32), jnp.bfloat16)

    @jax.jit
    def srowb(t, hi, lo):
        rows = t[hi]
        cols = lo[:, None] * 10 + jnp.arange(9)[None, :]
        return jnp.take_along_axis(rows, cols, axis=1).astype(jnp.float32)
    report(f"[{r}] super-rows bf16[T/8,80]+select",
           timeit(srowb, tblSb, idx8, sub8), r, 18)

    # giant rows: [T/64, 64*9] (select after)
    idx64 = jnp.asarray(rng.integers(0, T // 64, r), jnp.int32)
    sub64 = jnp.asarray(rng.integers(0, 64, r), jnp.int32)
    tblG = jnp.asarray(rng.random((T // 64, 128), np.float32))

    @jax.jit
    def grow(t, hi, lo):
        rows = t[hi]                       # [r, 128]
        cols = lo[:, None] + jnp.arange(9)[None, :]
        return jnp.take_along_axis(rows, cols, axis=1)
    report(f"[{r}] giant-rows f32[T/64,128]+select",
           timeit(grow, tblG, idx64, sub64), r, 36)

    # sorted indices (locality probe)
    idx_sorted = jnp.sort(idx)
    f = jax.jit(lambda t, i: t[i])
    report(f"[{r}] rows f32[T,9] SORTED idx", timeit(f, tbl9, idx_sorted),
           r, 36)

    # one-hot matmul gather within 512-entry blocks is not general; skip.


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for r in (1 << 14, 1 << 20):
        run(r)
