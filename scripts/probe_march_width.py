"""Round-4 probe: march-only throughput vs chunk width on the sorted
flagship 1080p frame (no shade passes — isolates the while_loop gather
rate), plus a dump of per-pass step counts for offline compaction-schedule
tuning.  Decides the mid-march-compaction design point (VERDICT r3 item 4):
compaction only pays if wide chunks raise rows/s enough to beat their
extra divergence."""
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


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.renderer import (_scene_hit_key, march_scene,
                                     RADIANCE_TMAX)

    scene = _flagship_scene(resolution=6, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, W, H)
    perm = jnp.argsort(_scene_hit_key(scene, o, d), stable=True)
    o, d = o[perm], d[perm]
    total = W * H

    for chunk in (8192, 16384, 32768, 65536, 131072):
        pad = (-total) % chunk
        op = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)]) if pad else o
        dp = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)]) if pad else d
        tp = jnp.concatenate([jnp.full(total, RADIANCE_TMAX),
                              jnp.full(pad, -jnp.inf)])

        @jax.jit
        def march_frame(op, dp, tp):
            def one(x):
                oc, dc, tc = x
                def live(_):
                    h, _ = march_scene(scene, oc, dc, tc, True)
                    return h.steps
                return jax.lax.cond(
                    jnp.any(_scene_hit_key(scene, oc, dc) < 0), live,
                    lambda _: jnp.zeros(oc.shape[0], jnp.int32), None)
            return jax.lax.map(one, (op.reshape(-1, chunk, 3),
                                     dp.reshape(-1, chunk, 3),
                                     tp.reshape(-1, chunk)))

        steps = march_frame(op, dp, tp)
        float(jnp.sum(steps))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            steps = march_frame(op, dp, tp)
        s = np.asarray(steps)
        dt = (time.perf_counter() - t0) / iters
        lockstep = int((np.minimum(s.max(axis=1), 255)
                        * chunk).sum())
        active = int(s.sum())
        print(f"march-only chunk {chunk:6d}: {dt*1e3:7.1f} ms  "
              f"lockstep {lockstep/1e6:5.1f}M rows -> "
              f"{lockstep/dt/1e6:5.1f}M rows/s  "
              f"(active {active/1e6:4.1f}M, waste "
              f"{lockstep/max(active,1):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
