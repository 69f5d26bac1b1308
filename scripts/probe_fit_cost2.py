"""Follow-up: wavefront fwd+bwd — plain retry, then segmented
(gradient-accumulation) variant whose per-call program is 1/K the frame."""
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
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (_scene_hit_key, tonemap,
                                     trace_radiance, render_image)

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    r = W * H
    cam_pos = jnp.asarray((320.0, 0.0, 40.0))
    cam_rot = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "plain"):
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
            print(f"C wavefront fwd+bwd:       {dt*1e3:8.1f} ms "
                  f"= {r/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"C plain FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    if which in ("all", "seg"):
        # segmented: sort rays once (host-side key), then K sequential
        # value_and_grad calls over row segments, grads accumulated.
        K = 4
        o, d = camera_rays(cam_pos, cam_rot, jnp.asarray(60.0), W, H)
        key = jax.jit(lambda s, o, d: _scene_hit_key(s, o, d))(scene, o, d)
        perm = jnp.argsort(key, stable=True)
        o_s, d_s = o[perm], d[perm]
        seg = r // K
        tgt = jnp.zeros((r, 3), jnp.float32)

        @jax.jit
        def seg_vg(p, o1, d1, t1):
            def loss_fn(p):
                s = rebuild_accel(graft_params(scene, p))
                rgb = trace_radiance(s, o1, d1, 0, mode)
                return jnp.sum((tonemap(rgb) - t1) ** 2) / (r * 3)

            return jax.value_and_grad(loss_fn)(p)

        # chunked within segment via lax.map? keep one-shot: 518k rays/lanes
        def full(p):
            tot, g = None, None
            for k in range(K):
                l1, g1 = seg_vg(p, o_s[k * seg:(k + 1) * seg],
                                d_s[k * seg:(k + 1) * seg],
                                tgt[k * seg:(k + 1) * seg])
                tot = l1 if tot is None else tot + l1
                g = g1 if g is None else jax.tree.map(jnp.add, g, g1)
            return tot

        try:
            dt = timeit(full, params)
            print(f"D segmented (K={K}, no chunking): {dt*1e3:8.1f} ms "
                  f"= {r/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"D segmented FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
