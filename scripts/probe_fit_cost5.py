"""Round-4 probe: 1080p fwd+bwd through the DEFERRED wavefront pipeline
with per-chunk remat (render_image(remat=True)) — the fix for the round-3
compile-helper crash (the un-remat'd backward stacked every chunk's
shading residuals frame-wide)."""
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

W, H = 1920, 1080


def timeit(f, *args, iters=2, warmup=1):
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
    from vrt.diff.fit import graft_params, rebuild_accel
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import render_image

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    targets = jnp.zeros((H, W, 3), jnp.float32)
    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    r = W * H
    chunks = [int(c) for c in sys.argv[1:]] or [8192, 16384]

    for chunk in chunks:
        @jax.jit
        def wavefront_vg(p, tgt):
            def loss_fn(p):
                s = rebuild_accel(graft_params(scene, p))
                img = render_image(s, W, H, mode, chunk_size=chunk,
                                   sort_rays=True, remat=True)[..., :3]
                return jnp.mean((img - tgt) ** 2)

            return jax.value_and_grad(loss_fn)(p)

        try:
            t0 = time.perf_counter()
            out = wavefront_vg(params, targets)
            float(out[0])
            print(f"compile+run chunk={chunk}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            dt = timeit(wavefront_vg, params, targets)
            print(f"wavefront fwd+bwd remat chunk={chunk:6d}: "
                  f"{dt*1e3:8.1f} ms = {r/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
