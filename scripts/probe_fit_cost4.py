"""Fit-step chunk sweep + wavefront-backward retry with the custom-VJP
permutation gather (the scatter-free transpose)."""
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
    import optax

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import graft_params, make_fit_step, rebuild_accel
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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "wave"):
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
            print(f"F wavefront fwd+bwd (perm vjp): {dt*1e3:8.1f} ms "
                  f"= {r/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"F wavefront FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    if which in ("all", "chunks"):
        for chunk in (8192, 16384):
            opt = optax.adam(1e-2)
            state = opt.init(params)
            step = make_fit_step(scene, cams, W, H, mode, opt,
                                 chunk_size=chunk)
            dt = timeit(lambda: step(params, state, targets)[2])
            print(f"E3 fit step chunk={chunk:6d}:   {dt*1e3:8.1f} ms "
                  f"= {r/dt/1e3:.0f}k rays/s", flush=True)


if __name__ == "__main__":
    main()
