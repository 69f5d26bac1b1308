"""Measure bounce-lane compaction (sort live bounce rays into dense
chunks) against the chord-clustered default, at the winning chunk size."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WIDTH, HEIGHT = 1920, 1080


def timeit(f, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import render_image

    scene = _flagship_scene(resolution=7, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    mode = RenderMode()
    r = WIDTH * HEIGHT

    for chunk in (8192, 16384):
        for bsort in (False, True):
            f = jax.jit(lambda s, c=chunk, b=bsort: render_image(
                s, WIDTH, HEIGHT, mode, chunk_size=c, sort_rays=True,
                bounce_sort=b))
            dt = timeit(f, scene)
            print(f"frame chunk={chunk:6d} bounce_sort={int(bsort)}: "
                  f"{dt*1e3:8.1f} ms = {r/dt/1e6:.2f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
