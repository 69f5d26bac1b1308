"""Headline benchmark: forward rays/s per chip at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE config 2 scaled to 1080p: a 128^3 SDF volume pair
(trilinear isosurface march), skybox env shading, directional light with
shadow rays, full lit pipeline.  ``vs_baseline`` is relative to the
reference's published numbers — it published none (BASELINE.md), so the
ratio is reported against this repo's own recorded prior round when
available (BENCH_BASELINE.json), else 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import tonemap, trace_radiance

    width, height = 1920, 1080
    scene = _flagship_scene(resolution=7)  # 129^3 voxel grids
    mode = RenderMode()

    @jax.jit
    def render(scene):
        o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                           width, height)
        rgb = trace_radiance(scene, o, d, 0, mode)
        return tonemap(rgb)

    # warmup + compile.  NOTE: under the axon runtime block_until_ready can
    # return before execution completes; a scalar readback is the reliable
    # queue drain, so every timing section ends with one.
    out = render(scene)
    checksum = float(jnp.sum(out))
    assert np.isfinite(checksum), checksum

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(scene)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters

    rays = width * height
    rays_per_s = rays / dt

    vs = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            if base.get("value"):
                vs = rays_per_s / float(base["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": "fwd rays/s/chip @1080p (128^3 SDF, lit+shadow+skybox)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }), flush=True)
    os._exit(0)  # skip slow axon teardown


if __name__ == "__main__":
    main()
