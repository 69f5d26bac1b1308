"""Is the lax.cond blocking the save-march checkpoint policy?

E1: fit step whose chunk body is trace_radiance WITHOUT the sky-skip
    cond, under save_only_these_names("march") — if names inside cond
    were the blocker, the backward stops replaying the while_loops here.
E2: same but WITH the cond (the production fit path) — baseline 7.38 s.
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
    from functools import partial

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import graft_params, rebuild_accel
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (_scene_hit_key, tonemap,
                                     trace_radiance)

    mode = RenderMode()
    scene0 = _flagship_scene(resolution=6, use_colors=True)
    params = {"sdf": scene0.volumes.sdf,
              "voxel_colors": scene0.voxel_colors}
    r = W * H
    o, d = camera_rays(jnp.asarray((320.0, 0.0, 40.0)),
                       jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32),
                       jnp.asarray(60.0), W, H)
    tgt = jnp.zeros((r, 3), jnp.float32)

    def make_vg(use_cond):
        @jax.jit
        def vg(p, o, d, tgt):
            def loss_fn(p):
                s = rebuild_accel(graft_params(scene0, p))
                perm = jnp.argsort(_scene_hit_key(s, o, d), stable=True)
                os_, ds_ = o[perm], d[perm]
                pad = (-os_.shape[0]) % CHUNK
                if pad:
                    os_ = jnp.concatenate(
                        [os_, jnp.zeros((pad, 3), os_.dtype)])
                    ds_ = jnp.concatenate(
                        [ds_, jnp.ones((pad, 3), ds_.dtype)])
                from vrt.shade import texture as _tex

                @partial(jax.checkpoint,
                         policy=jax.checkpoint_policies
                         .save_only_these_names("march"))
                def traced(od):
                    oc, dc = od
                    if use_cond:
                        return jax.lax.cond(
                            jnp.any(_scene_hit_key(s, oc, dc) < 0),
                            lambda _: trace_radiance(s, oc, dc, 0, mode),
                            lambda _: _tex.sample_env(s.env, dc), None)
                    return trace_radiance(s, oc, dc, 0, mode)

                rgb = jax.lax.map(traced, (os_.reshape(-1, CHUNK, 3),
                                           ds_.reshape(-1, CHUNK, 3)))
                rgb = rgb.reshape(-1, 3)[:o.shape[0]][jnp.argsort(perm)]
                return jnp.mean((tonemap(rgb) - tgt) ** 2)

            return jax.value_and_grad(loss_fn)(p)

        return vg

    for name, use_cond in (("E1 no-cond ", False), ("E2 with-cond", True)):
        try:
            dt = timeit(make_vg(use_cond), params, o, d, tgt)
            print(f"{name} fwd+bwd save-march: {dt*1e3:8.1f} ms "
                  f"= {r/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
