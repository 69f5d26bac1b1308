"""Flagship-frame sweep: block-mode mid-march compaction schedules vs the
round-4 row-mode compaction and plain chunks (VERDICT r4 item 3 —
"compaction without global sorts").

Measures BOTH the primary-march-only time (march_scene with the given
lane marcher) and the full flagship 1080p frame.

Usage: python scripts/probe_block_compact.py
"""
import os
import sys
import time
from functools import partial

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


def _time(fn, iters=4):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.march.march import make_compact_marcher
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (RADIANCE_TMAX, _scene_hit_key,
                                     march_scene, render_image)

    mode = RenderMode()
    w, h = 1920, 1080
    scene = _flagship_scene(resolution=7, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, w, h)
    # frame-sorted rays, like render_image(sort_rays=True) feeds the march
    key = _scene_hit_key(scene, o, d)
    perm = jnp.argsort(key, stable=True)
    o, d = o[perm], d[perm]
    t_max = jnp.full(o.shape[0], RADIANCE_TMAX)
    # pad to the chunk lcm like render_image does (dead pad lanes)
    pad = (-o.shape[0]) % 65536
    o = jnp.concatenate([o, jnp.zeros((pad, 3))])
    d = jnp.concatenate([d, jnp.ones((pad, 3))])
    t_max = jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)])

    @partial(jax.jit, static_argnames=("mk_args",))
    def march_only(o, d, t_max, mk_args=None):
        lm = (make_compact_marcher(**dict(mk_args)) if mk_args is not None
              else None)
        hit, inst = march_scene(scene, o, d, t_max, True, lane_marcher=lm)
        return hit.t, hit.hit

    rows = []

    def row(label, mk_args):
        dt = _time(lambda: march_only(o, d, t_max, mk_args=mk_args))
        rows.append((label, dt))
        print(f"march {label:>42}: {dt*1e3:7.1f} ms", flush=True)

    row("plain chunks (none)", None)
    row("row (8,247) r4 default",
        (("march_chunk", 65536), ("schedule", (8, 247)), ("block", None)))
    for sched in [(8, 247), (4, 8, 16, 32, 195), (2, 4, 8, 16, 32, 64, 129),
                  (4, 12, 36, 203), (8, 24, 223)]:
        for block in (512, 1024):
            row(f"block{block} {sched}",
                (("march_chunk", 65536), ("schedule", sched),
                 ("block", block)))

    # full frame for the best few (re-timed at frame level)
    print("\nframe-level:", flush=True)

    def frame(compact, mk=None):
        return render_image(scene, w, h, mode, chunk_size=8192,
                            sort_rays=True, compact=compact)

    dt = _time(lambda: frame(True))
    print(f"frame compact=True (r4 row mode): {dt*1e3:7.1f} ms "
          f"({w*h/dt/1e6:.2f} Mrays/s)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
