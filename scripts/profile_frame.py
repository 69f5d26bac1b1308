"""On-device phase breakdown of the 1080p bench frame + primitive costs.

Every timing drains the queue via a scalar readback (axon's
block_until_ready can return early).  Prints a table the next perf target
can be picked from (VERDICT round-1 item 10).
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
CHUNK = 16384
RES = 7


def timeit(f, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = f(*args)
        drain = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    drain = float(jnp.sum(jax.tree.leaves(out)[0]))  # noqa
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (render_image, _scene_hit_key,
                                     march_scene, trace_radiance, tonemap)
    from vrt.march.march import march_volume

    fast = os.environ.get("VRT_BENCH_EXACT") != "1"
    scene = _flagship_scene(resolution=RES, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16 if fast else None)
    mode = RenderMode()

    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       WIDTH, HEIGHT)
    o = jax.block_until_ready(o)
    r = o.shape[0]
    print(f"rays: {r}", flush=True)

    # -- full frame --------------------------------------------------------
    f_frame = jax.jit(lambda s: render_image(s, WIDTH, HEIGHT, mode,
                                             chunk_size=CHUNK,
                                             sort_rays=True))
    dt = timeit(f_frame, scene)
    print(f"full frame (sorted, chunk {CHUNK}): {dt*1e3:8.1f} ms "
          f"= {r/dt/1e6:.2f}M rays/s", flush=True)

    # -- decomposition: unlit (no shadow/bounce) and lit-no-bounce ----------
    import dataclasses as _dc

    mode_unlit = RenderMode(lit=False)
    f_unlit = jax.jit(lambda s: render_image(s, WIDTH, HEIGHT, mode_unlit,
                                             chunk_size=CHUNK,
                                             sort_rays=True))
    dt = timeit(f_unlit, scene)
    print(f"frame unlit (march+resolve+albedo):    {dt*1e3:8.1f} ms",
          flush=True)

    scene_norefl = _dc.replace(scene, any_reflective=False)
    f_nb = jax.jit(lambda s: render_image(s, WIDTH, HEIGHT, mode,
                                          chunk_size=CHUNK, sort_rays=True))
    dt = timeit(f_nb, scene_norefl)
    print(f"frame lit, bounce pass disabled:       {dt*1e3:8.1f} ms",
          flush=True)

    # -- frame without sorting ----------------------------------------------
    f_frame_ns = jax.jit(lambda s: render_image(s, WIDTH, HEIGHT, mode,
                                                chunk_size=CHUNK,
                                                sort_rays=False))
    dt = timeit(f_frame_ns, scene)
    print(f"full frame (no sort,  chunk {CHUNK}): {dt*1e3:8.1f} ms",
          flush=True)

    # -- primitives ----------------------------------------------------------
    key_f = jax.jit(lambda s, o, d: _scene_hit_key(s, o, d))
    dt = timeit(key_f, scene, o, d)
    print(f"_scene_hit_key (2M rays):  {dt*1e3:8.1f} ms", flush=True)

    key = key_f(scene, o, d)
    sort_f = jax.jit(lambda k: jnp.argsort(k, stable=True))
    dt = timeit(sort_f, key)
    print(f"argsort 2M i32 (stable):   {dt*1e3:8.1f} ms", flush=True)

    perm = sort_f(key)
    gather_f = jax.jit(lambda o, p: o[p])
    dt = timeit(gather_f, o, perm)
    print(f"permute 2M x3 f32:         {dt*1e3:8.1f} ms", flush=True)

    scatter_f = jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x))
    dt = timeit(scatter_f, o, perm)
    print(f"unpermute scatter 2M x3:   {dt*1e3:8.1f} ms", flush=True)

    # -- primary march only (sorted chunks, no shading) ----------------------
    t_max = jnp.full(r, 1e4, jnp.float32)

    def march_only(scene, o, d, t_max):
        hit, inst = march_scene(scene, o, d, t_max, True)
        return hit.t

    pad = (-r) % CHUNK
    os_, ds_ = o[perm], d[perm]
    if pad:
        os_ = jnp.concatenate([os_, jnp.zeros((pad, 3), os_.dtype)])
        ds_ = jnp.concatenate([ds_, jnp.ones((pad, 3), ds_.dtype)])
        t_pad = jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)])
    else:
        t_pad = t_max
    oc = os_.reshape(-1, CHUNK, 3)
    dc = ds_.reshape(-1, CHUNK, 3)
    tc = t_pad.reshape(-1, CHUNK)
    march_f = jax.jit(lambda s, oc, dc, tc: jax.lax.map(
        lambda x: march_only(s, *x), (oc, dc, tc)))
    dt = timeit(march_f, scene, oc, dc, tc)
    print(f"primary march (sorted):    {dt*1e3:8.1f} ms", flush=True)

    # -- roofline: per-lane step counts from the instrumented march ----------
    def march_stats(scene, oc, dc, tc):
        def one(x):
            hit, _ = march_scene(scene, *x, True)
            return hit.steps, hit.hit
        return jax.lax.map(one, (oc, dc, tc))

    stats_f = jax.jit(march_stats)
    steps, hits = stats_f(scene, oc, dc, tc)
    steps = np.asarray(steps)          # [chunks, CHUNK] active steps/lane
    hits = np.asarray(hits)
    iters = steps.max(axis=1)          # per-chunk while_loop trip count
    active_steps = int(steps.sum())
    total_lane_steps = int((iters * CHUNK).sum())
    bpf = 20 if fast else 36           # bf16 9ch corner row (+i32 accel in
    #                                    channel 9) vs f32
    print(f"primary march steps: active {active_steps/r:.1f}/ray, "
          f"lockstep {total_lane_steps/r:.1f}/ray "
          f"(divergence waste {total_lane_steps/max(active_steps,1):.2f}x)",
          flush=True)
    gb = total_lane_steps * bpf / 1e9
    print(f"primary gather traffic: {gb:.2f} GB/frame "
          f"({active_steps*bpf/1e9:.2f} GB useful)", flush=True)

    # -- single-volume march rate (accel modes) ------------------------------
    from vrt.march.types import DeviceVolume
    from vrt.volume.volume import VoxelVolume
    from vrt.volume.sdf import Sphere

    vol = VoxelVolume.from_generator(Sphere(radius=70.0), resolution=6,
                                     extends=100.0)
    for mode_name in ("octree", "chebyshev"):
        dv = DeviceVolume.from_volume(
            vol, accel_mode=mode_name,
            march_dtype=jnp.bfloat16 if fast else None)
        rng = np.random.default_rng(1)
        ro = rng.normal(size=(1 << 20, 3))
        ro = ro / np.linalg.norm(ro, axis=-1, keepdims=True) * 300.0
        rd = -ro + rng.normal(scale=30.0, size=ro.shape)
        rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
        ro = jnp.asarray(ro, jnp.float32)
        rd = jnp.asarray(rd, jnp.float32)
        tm = jnp.full(1 << 20, 1e4, jnp.float32)
        mf = jax.jit(lambda o, d, t, dv=dv: march_volume(dv, o, d, t).t)
        dt = timeit(mf, ro, rd, tm)
        print(f"march_volume 65^3 {mode_name:9s} 1M rays: {dt*1e3:8.1f} ms "
              f"= {(1 << 20)/dt/1e6:.2f}M rays/s", flush=True)

    # -- raw gather rate (drained) -------------------------------------------
    rows = 128 ** 3
    tbl = jnp.asarray(np.random.default_rng(0).random((rows, 9), np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, rows, 1 << 20),
                      jnp.int32)
    g = jax.jit(lambda t, i: jnp.sum(t[i], axis=0))
    dt = timeit(g, tbl, idx, iters=10)
    print(f"XLA row-gather 1M x 9f32:  {dt*1e3:8.1f} ms = "
          f"{(1 << 20)*36/dt/1e9:.0f} GB/s eff", flush=True)

    # scatter-add (the backward's transpose-of-gather)
    vals = jnp.asarray(np.random.default_rng(2).random((1 << 20, 9),
                                                       np.float32))
    sc = jax.jit(lambda t, i, v: t.at[i].add(v))
    dt = timeit(sc, jnp.zeros((rows, 9), jnp.float32), idx, vals, iters=10)
    print(f"XLA scatter-add 1M x 9f32: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
