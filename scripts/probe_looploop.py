"""Round-3 probe: decompose the march's per-iteration cost.

(1) while_loop of F fixed iterations x one W-row 9ch gather + trivial carry
    -> per-iteration cost vs lane width W,
(2) the real march at chunk widths 16k/64k/256k on the flagship frame,
    reporting ms per lockstep-row.
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

WIDTH, HEIGHT = 1920, 1080
RES = 7


def timeit(f, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = f(*args)
        jnp.sum(jax.tree.leaves(out)[0]).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.renderer import _scene_hit_key, march_scene

    scene = _flagship_scene(resolution=RES, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    tbl = scene.volumes.corners.reshape(-1, scene.volumes.corners.shape[-1])
    rows = tbl.shape[0]
    rng = np.random.default_rng(0)

    # (1) while_loop gather microbench
    ITERS = 64
    for w in (16384, 65536, 262144):
        idx0 = jnp.asarray(rng.integers(0, rows, w), jnp.int32)

        def loop(tbl, idx0):
            def body(c):
                i, idx, acc = c
                v = tbl[idx]                       # [w, 9] bf16
                acc = acc + v[:, 0].astype(jnp.float32)
                idx = (idx + 7919) % rows          # data-dep next index
                return i + 1, idx, acc

            def cond(c):
                return c[0] < ITERS

            _, _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), idx0, jnp.zeros(w, jnp.float32)))
            return acc

        f = jax.jit(loop)
        dt = timeit(f, tbl, idx0, iters=5)
        per_it = dt / ITERS
        print(f"  while_loop gather w={w:>7d}: {per_it*1e6:8.1f} us/iter = "
              f"{w/per_it/1e6:7.1f} M rows/s", flush=True)

    # same but with ~march-body-scale VPU math attached
    for w in (16384, 65536, 262144):
        idx0 = jnp.asarray(rng.integers(0, rows, w), jnp.int32)

        def loop2(tbl, idx0):
            def body(c):
                i, idx, acc = c
                v = tbl[idx].astype(jnp.float32)   # [w, ch]
                # ~march-body flavored elementwise chain
                x = v[:, :3] * 1.1 + v[:, 3:6]
                y = jnp.minimum(x, v[:, 5:8])
                z = jnp.max(y, axis=-1) + jnp.min(x, axis=-1)
                q = jnp.floor(z * 0.25).astype(jnp.int32)
                acc = acc + z
                idx = (idx * 31 + q) % rows
                return i + 1, idx, acc

            def cond(c):
                return c[0] < ITERS

            _, _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), idx0, jnp.zeros(w, jnp.float32)))
            return acc

        f = jax.jit(loop2)
        dt = timeit(f, tbl, idx0, iters=5)
        per_it = dt / ITERS
        print(f"  while_loop gather+math w={w:>7d}: {per_it*1e6:8.1f} us/iter"
              f" = {w/per_it/1e6:7.1f} M rows/s", flush=True)

    # (2) real march at several chunk widths
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       WIDTH, HEIGHT)
    r = o.shape[0]
    key = jax.jit(_scene_hit_key)(scene, o, d)
    perm = jnp.argsort(key, stable=True)
    o_s, d_s = o[perm], d[perm]
    t_max = jnp.full(r, 1e4, jnp.float32)

    for CH in (16384, 65536, 262144):
        pad = (-r) % CH
        o_p = jnp.concatenate([o_s, jnp.zeros((pad, 3))]) if pad else o_s
        d_p = jnp.concatenate([d_s, jnp.ones((pad, 3))]) if pad else d_s
        t_p = (jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)])
               if pad else t_max)
        oc = o_p.reshape(-1, CH, 3)
        dc = d_p.reshape(-1, CH, 3)
        tc = t_p.reshape(-1, CH)

        def march_f(s, oc, dc, tc):
            def one(x):
                h, _ = march_scene(s, *x, True)
                return h.t, h.steps
            return jax.lax.map(one, (oc, dc, tc))

        f = jax.jit(march_f)
        t_out, steps = f(scene, oc, dc, tc)
        dt = timeit(f, scene, oc, dc, tc)
        st = np.asarray(steps)
        # lockstep rows: per chunk per pass we don't know; approximate with
        # per-chunk max of total (lower bound) -- report active too
        print(f"  primary march chunk {CH:>7d}: {dt*1e3:8.1f} ms "
              f"(active {st.sum()/r:.2f}/ray)", flush=True)


if __name__ == "__main__":
    main()
