"""Microbench: alternatives for the gather-transpose (cotangent
accumulation into the corner/color tables) on TPU.

The backward of ``table[idx]`` is a scatter-add; XLA TPU scatter was
measured ~6x slower than sort+gather at 2M rows (renderer.py:547).  This
probe measures the candidate replacements at the fit-step's real shapes
(duplicate-heavy indices: ~2M gathered rows over ~0.5M-row tables, many
rays hitting the same cells):

  scatter        zeros.at[idx].add(g)                      (the status quo)
  scatter_chunk  the same but 16k rows at a time (the remat'd per-chunk
                 shape: 127 chunked scatters)
  sorted         sort rows by idx, then .add(indices_are_sorted=True)
  segsum         sort + segment_sum over duplicate runs + one scatter of
                 unique rows (sorted+unique)
  segsum_chunk   segsum at 16k rows/chunk (the actual backward shape)

Usage: python scripts/probe_scatter_modes.py [--rows 2097152]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _time(fn, *a, iters=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def segsum_transpose(idx, g, nrows):
    """sort + segment-sum duplicate runs + sorted-unique scatter."""
    r = idx.shape[0]
    order = jnp.argsort(idx)
    si = idx[order]
    sg = g[order]
    first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    seg = jnp.cumsum(first) - 1
    sums = jax.ops.segment_sum(sg, seg, num_segments=r,
                               indices_are_sorted=True)
    nseg = jnp.sum(first.astype(jnp.int32))
    firsts = jnp.nonzero(first, size=r, fill_value=0)[0]
    tgt = jnp.where(jnp.arange(r) < nseg, si[firsts], nrows)
    return jnp.zeros((nrows, g.shape[1]), g.dtype).at[tgt].add(
        sums, mode="drop", indices_are_sorted=True, unique_indices=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--table", type=int, default=524288)
    ap.add_argument("--cols", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--hot", type=int, default=65536,
                    help="distinct hot rows (visible surface cells)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # duplicate-heavy, locally clustered indices like hit cells of sorted
    # rays: a random walk over a hot subset
    hot = np.sort(rng.choice(args.table, size=args.hot, replace=False))
    walk = np.clip(np.cumsum(rng.integers(-3, 4, size=args.rows)), 0,
                   args.hot - 1)
    idx = jnp.asarray(hot[walk], jnp.int32)
    g = jnp.asarray(rng.normal(size=(args.rows, args.cols)), jnp.float32)
    nrows = args.table

    @jax.jit
    def scatter(idx, g):
        return jnp.zeros((nrows, args.cols), g.dtype).at[idx].add(g)

    @jax.jit
    def scatter_chunk(idx, g):
        def one(acc, x):
            i, gg = x
            return acc.at[i].add(gg), None
        acc0 = jnp.zeros((nrows, args.cols), g.dtype)
        acc, _ = jax.lax.scan(one, acc0,
                              (idx.reshape(-1, args.chunk),
                               g.reshape(-1, args.chunk, args.cols)))
        return acc

    @jax.jit
    def sorted_scatter(idx, g):
        order = jnp.argsort(idx)
        return jnp.zeros((nrows, args.cols), g.dtype).at[idx[order]].add(
            g[order], indices_are_sorted=True)

    @jax.jit
    def segsum(idx, g):
        return segsum_transpose(idx, g, nrows)

    @jax.jit
    def segsum_chunk(idx, g):
        def one(acc, x):
            i, gg = x
            return acc + segsum_transpose(i, gg, nrows), None
        acc0 = jnp.zeros((nrows, args.cols), g.dtype)
        acc, _ = jax.lax.scan(one, acc0,
                              (idx.reshape(-1, args.chunk),
                               g.reshape(-1, args.chunk, args.cols)))
        return acc

    ref = np.asarray(scatter(idx, g))
    for name, fn in [("scatter", scatter), ("scatter_chunk", scatter_chunk),
                     ("sorted", sorted_scatter), ("segsum", segsum),
                     ("segsum_chunk", segsum_chunk)]:
        out = np.asarray(fn(idx, g))
        err = float(np.abs(out - ref).max())
        dt = _time(fn, idx, g)
        print(f"{name:>14}: {dt*1e3:8.2f} ms   max|err| {err:.2e} "
              f"({args.rows/dt/1e6:.1f} M rows/s)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
