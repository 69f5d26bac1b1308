"""Decompose the 1080p fwd+bwd fit-step cost (VERDICT r2 item 2).

Times, on the config-6 scene (65^3, voxel colors, 1080p):
  A. the current fit step (render_views chunked remat path),
  B. forward-only loss through the same path,
  C. value_and_grad straight through the deferred wavefront render_image
     (sorted chunks + cond-skip + deferred shadow/bounce) — the marches
     are stop_gradient by construction, so the question is whether the
     backward fits memory and what it costs without the remat replay.
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

W, H = 1920, 1080
CHUNK = 32768


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
    import optax

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import (graft_params, make_fit_step, rebuild_accel,
                              render_views)
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import render_image

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    cams = [dict(position=(320.0, 0.0, 40.0),
                 rotation=np.asarray([0.0, 0.0, 1.0, 0.0], np.float32),
                 fov=60.0)]
    targets = jnp.zeros((1, W * H, 3), jnp.float32)
    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    r = W * H

    # B. forward-only loss through render_views
    @jax.jit
    def fwd_loss(p, targets):
        s = rebuild_accel(graft_params(scene, p))
        imgs = render_views(s, cams, W, H, mode, chunk_size=CHUNK)
        return jnp.mean((imgs - targets) ** 2)

    dt = timeit(fwd_loss, params, targets)
    print(f"B fwd-only loss (render_views): {dt*1e3:8.1f} ms", flush=True)

    # A. current fit step
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_fit_step(scene, cams, W, H, mode, opt, chunk_size=CHUNK)

    def run_step():
        return step(params, state, targets)[2]

    dt = timeit(run_step)
    print(f"A fit step (render_views+remat): {dt*1e3:8.1f} ms "
          f"= {r/dt/1e3:.0f}k rays/s", flush=True)

    # C. value_and_grad through the deferred wavefront render_image
    tgt_img = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
    def wavefront_vg(p, tgt):
        def loss_fn(p):
            s = rebuild_accel(graft_params(scene, p))
            img = render_image(s, W, H, mode, chunk_size=8192,
                               sort_rays=True)[..., :3]
            return jnp.mean((img - tgt) ** 2)

        return jax.value_and_grad(loss_fn)(p)

    try:
        dt = timeit(wavefront_vg, params, tgt_img)
        print(f"C fwd+bwd (wavefront render_image): {dt*1e3:8.1f} ms "
              f"= {r/dt/1e3:.0f}k rays/s", flush=True)
    except Exception as e:  # noqa: BLE001 — OOM diagnosis
        print(f"C wavefront fwd+bwd FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
