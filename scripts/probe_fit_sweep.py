"""config6 (1080p fwd+bwd fit step) sweep: chunk size x compact, with the
corner-packed color field — finds the remat'd backward's best shape.
Bigger chunks mean fewer per-chunk cotangent zero-broadcast/accumulate
iterations in the scan transpose; compact caps the march divergence that
bigger chunks would otherwise pay.

Usage: python scripts/probe_fit_sweep.py [--chunks 16384 32768 65536]
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


def _time(fn, *a, iters=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[16384, 32768, 65536])
    ap.add_argument("--compact", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import graft_params, rebuild_accel
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import render_image

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    w, h = args.width, args.height
    targets = jnp.zeros((w * h, 3), jnp.float32)
    rays = w * h
    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}

    for chunk in args.chunks:
        for compact in args.compact:
            def loss_fn(p, chunk=chunk, compact=bool(compact)):
                s = rebuild_accel(graft_params(scene, p))
                img = render_image(s, w, h, mode, chunk_size=chunk,
                                   sort_rays=True, remat=True,
                                   compact=compact)[..., :3]
                return jnp.mean((img.reshape(-1, 3) - targets) ** 2)

            fwd = _time(jax.jit(loss_fn), params)
            bwd = _time(jax.jit(jax.value_and_grad(loss_fn)), params)
            print(f"chunk {chunk:6d} compact {compact}: "
                  f"fwd {fwd*1e3:7.1f} ms ({rays/fwd/1e6:.2f} M) | "
                  f"fwd+bwd {bwd*1e3:7.1f} ms ({rays/bwd/1e6:.3f} M)",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
