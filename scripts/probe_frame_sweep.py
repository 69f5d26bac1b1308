"""Sweep frame-level scheduling knobs (chunk size, sort key) on the chip.

Round-3 follow-up to scripts/profile_frame.py: the phase table showed the
primary march at 3.25x divergence waste (lockstep 10.8 vs active 3.3
steps/ray) — chunking/sorting, not gather rate, is the frontier.
"""
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

    for sort in ("chord", "probe"):
        for chunk in (8192, 16384, 32768, 65536):
            f = jax.jit(lambda s, c=chunk, so=sort: render_image(
                s, WIDTH, HEIGHT, mode, chunk_size=c,
                sort_rays=(True if so == "chord" else "probe")))
            dt = timeit(f, scene)
            print(f"frame sort={sort:5s} chunk={chunk:6d}: "
                  f"{dt*1e3:8.1f} ms = {r/dt/1e6:.2f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
