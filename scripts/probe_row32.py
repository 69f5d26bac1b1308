"""Is the in-loop gather ISSUE-RATE bound (rows/s independent of row
bytes)?  If 32 B rows gather at ~16 B rates, a fused 16ch bf16 row
(8 corners + accel + pad) halves the march's gathers per step.
Also measures the u8 accel (VMEM-resident) in-loop rate.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROWS = 2 * 129 ** 3 // 1  # flagship-scale table
ITERS = 64


def timeit(f, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = f(*args)
        jnp.sum(jax.tree.leaves(out)[0]).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def loop_gather(tbl, idx0, rows):
    def body(c):
        i, idx, acc = c
        v = tbl[idx]
        acc = acc + v[:, 0].astype(jnp.float32)
        nxt = (idx + 7919 + acc.astype(jnp.int32) % 3) % rows
        return i + 1, nxt, acc

    def cond(c):
        return c[0] < ITERS

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0,
                     jnp.zeros(idx0.shape[0], jnp.float32)))
    return acc


def loop_gather_u8(tbl, idx0, rows):
    def body(c):
        i, idx, acc = c
        v = tbl[idx].astype(jnp.int32)
        acc = acc + v
        nxt = (idx + 7919 + acc % 3) % rows
        return i + 1, nxt, acc

    def cond(c):
        return c[0] < ITERS

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), idx0,
                     jnp.zeros(idx0.shape[0], jnp.int32)))
    return acc


def main():
    rng = np.random.default_rng(0)
    for w in (16384, 65536):
        idx0 = jnp.asarray(rng.integers(0, ROWS, w), jnp.int32)
        for ch, dt in ((8, jnp.bfloat16), (16, jnp.bfloat16),
                       (8, jnp.float32), (9, jnp.bfloat16)):
            tbl = jnp.asarray(
                rng.random((ROWS, ch), np.float32) - 0.5).astype(dt)
            f = jax.jit(lambda t, i: loop_gather(t, i, ROWS))
            sec = timeit(f, tbl, idx0)
            per = sec / ITERS
            by = ch * (2 if dt == jnp.bfloat16 else 4)
            print(f"  w={w:>6d} row {by:>2d}B ({ch}x{np.dtype(dt).name}): "
                  f"{per*1e6:7.1f} us/iter = {w/per/1e6:6.1f} M rows/s",
                  flush=True)
        # u8 accel table (VMEM-size, 2.1 MB and 4.2 MB)
        for r8 in (129 ** 3, 2 * 129 ** 3):
            t8 = jnp.asarray(rng.integers(0, 255, r8), jnp.uint8)
            i8 = jnp.asarray(rng.integers(0, r8, w), jnp.int32)
            f = jax.jit(lambda t, i, r8=r8: loop_gather_u8(t, i, r8))
            sec = timeit(f, t8, i8)
            per = sec / ITERS
            print(f"  w={w:>6d} u8[{r8/1e6:.1f}M rows]: {per*1e6:7.1f} "
                  f"us/iter = {w/per/1e6:6.1f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
