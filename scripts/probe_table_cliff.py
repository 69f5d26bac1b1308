"""Find the table-size cliff for in-loop gather rate (VMEM residency) and
the rate for accel-only flat gathers — sizing the split-phase march.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
R = 1 << 20
N_IT = 32


def timeit(f, *args, iters=5):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def loop_gather(tbl, t_rows, vec_width):
    idx = jnp.asarray(rng.integers(0, t_rows, R), jnp.int32)

    @jax.jit
    def f(t, i0):
        def body(k, carry):
            i, acc = carry
            v = t[i] if vec_width else jnp.take(t, i)
            v0 = (v[:, 0] if vec_width else v).astype(jnp.float32)
            acc = acc + v0
            i = (i + v0.astype(jnp.int32) + k + 1) % t_rows
            return (i, acc)
        _, acc = jax.lax.fori_loop(0, N_IT, body,
                                   (i0, jnp.zeros(R, jnp.float32)))
        return acc
    dt = timeit(f, tbl, idx)
    return R * N_IT / dt / 1e6


def main():
    print("devices:", jax.devices(), flush=True)
    # bf16[T,9] cliff
    for t_rows in (2 ** 18, 2 ** 19, 700_000, 2 ** 20, 1_400_000, 2 ** 21):
        tbl = jnp.asarray(rng.random((t_rows, 9), np.float32), jnp.bfloat16)
        mb = t_rows * 18 / 1e6
        rate = loop_gather(tbl, t_rows, True)
        print(f"bf16[{t_rows:>8},9] ({mb:6.1f} MB): {rate:7.1f} M rows/s",
              flush=True)
    # flat accel gathers (i8 / i32) at accel-table sizes
    for t_rows in (128 ** 3, 256 ** 3):
        for dt_, name in ((jnp.int8, "i8 "), (jnp.int32, "i32")):
            tbl = jnp.asarray(rng.integers(1, 7, t_rows), dt_)
            mb = t_rows * np.dtype(dt_).itemsize / 1e6
            rate = loop_gather(tbl, t_rows, False)
            print(f"flat {name}[{t_rows:>9}] ({mb:6.1f} MB): "
                  f"{rate:7.1f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
