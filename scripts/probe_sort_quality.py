"""Probe-sort vs chord-sort on the 1080p flagship frame, measured clean
(run nothing else while this is on the chip).  Also times the probe-key
computation alone and reports the resulting chunk-homogeneity (lockstep
rows under each permutation).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WIDTH, HEIGHT, CHUNK = 1920, 1080, 16384


def timeit(f, *args, iters=3):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (render_image, _probe_steps_key,
                                     _scene_hit_key, march_scene)

    scene = _flagship_scene(resolution=7, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    mode = RenderMode()

    for sort in ("chord", "probe"):
        f = jax.jit(lambda s, sort=sort: render_image(
            s, WIDTH, HEIGHT, mode, chunk_size=CHUNK, sort_rays=sort))
        dt = timeit(f, scene)
        print(f"frame sort={sort:5s}: {dt*1e3:8.1f} ms = "
              f"{WIDTH*HEIGHT/dt/1e6:.2f}M rays/s", flush=True)

    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       WIDTH, HEIGHT)
    kf = jax.jit(lambda s, o, d: _probe_steps_key(s, o, d, WIDTH, HEIGHT,
                                                  True, CHUNK))
    dt = timeit(kf, scene, o, d)
    print(f"probe key alone: {dt*1e3:8.1f} ms", flush=True)

    # chunk homogeneity: lockstep rows for primary march under each perm
    r = o.shape[0]
    t_max = jnp.full(r, 1e4, jnp.float32)

    def lockstep_rows(perm):
        os_, ds_ = o[perm], d[perm]
        pad = (-r) % CHUNK
        if pad:
            os_ = jnp.concatenate([os_, jnp.zeros((pad, 3), os_.dtype)])
            ds_ = jnp.concatenate([ds_, jnp.ones((pad, 3), ds_.dtype)])
            tp = jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)])
        else:
            tp = t_max

        def one(x):
            h, _ = march_scene(scene, *x, True)
            return h.steps

        steps = jax.jit(lambda oc, dc, tc: jax.lax.map(one, (oc, dc, tc)))(
            os_.reshape(-1, CHUNK, 3), ds_.reshape(-1, CHUNK, 3),
            tp.reshape(-1, CHUNK))
        s = np.asarray(steps)
        return int((s.max(axis=1) * CHUNK).sum()), int(s.sum())

    for name, key in (("chord", _scene_hit_key(scene, o, d)),
                      ("probe", kf(scene, o, d))):
        perm = jnp.argsort(key, stable=True)
        lock, act = lockstep_rows(perm)
        print(f"{name:5s} perm: lockstep {lock/1e6:6.1f} M rows "
              f"(active {act/1e6:5.1f} M, waste {lock/max(act,1):.2f}x)",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
