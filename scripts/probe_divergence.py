"""Round-3 probe: where does the 3.25x lockstep waste come from, and is the
16k-row per-step gather issue-rate-bound vs wider batches?

Measures on the real chip:
  A) row-gather rate on the flagship's actual bf16 9-ch corner table as a
     function of index-batch size (16k .. 1M),
  B) per-candidate-pass step structure: per chunk, max vs mean steps in
     pass 0 and pass 1 separately (the lockstep cost is sum_j max(pass_j),
     which no total-steps sort can homogenize),
  C) full-frame time vs chunk size.
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


def timeit(f, *args, iters=5, warmup=2):
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
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (render_image, _scene_hit_key,
                                     march_scene)
    from vrt.march.march import march_lanes

    scene = _flagship_scene(resolution=RES, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    mode = RenderMode()

    # -- A: gather rate vs batch size on the real corner table -------------
    tbl = scene.volumes.corners.reshape(-1, scene.volumes.corners.shape[-1])
    print(f"corner table: {tbl.shape} {tbl.dtype} = "
          f"{tbl.size * tbl.dtype.itemsize / 1e6:.1f} MB", flush=True)
    rows = tbl.shape[0]
    rng = np.random.default_rng(0)
    for bs in (16384, 65536, 262144, 1 << 20):
        idx = jnp.asarray(rng.integers(0, rows, bs), jnp.int32)
        g = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32), axis=0))
        dt = timeit(g, tbl, idx, iters=10)
        print(f"  gather {bs:>8d} rows: {dt*1e3:7.2f} ms = "
              f"{bs/dt/1e6:6.1f} M rows/s", flush=True)
    # u8 accel gather rate vs batch (split-phase candidate)
    acc8 = jnp.asarray(rng.integers(0, 255, rows), jnp.uint8)
    for bs in (16384, 262144, 1 << 20):
        idx = jnp.asarray(rng.integers(0, rows, bs), jnp.int32)
        g = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.int32)))
        dt = timeit(g, acc8, idx, iters=10)
        print(f"  u8 gather {bs:>8d} rows: {dt*1e3:7.2f} ms = "
              f"{bs/dt/1e6:6.1f} M rows/s", flush=True)

    # -- B: per-pass step structure ----------------------------------------
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       WIDTH, HEIGHT)
    r = o.shape[0]
    key = jax.jit(_scene_hit_key)(scene, o, d)
    perm = jnp.argsort(key, stable=True)
    o_s, d_s = o[perm], d[perm]
    t_max = jnp.full(r, 1e4, jnp.float32)

    CHUNK = 16384
    from vrt.core import quat as vq
    from vrt.march.march import ray_aabb
    from vrt.march.types import MarchHit
    import dataclasses

    def per_pass_steps(scene, o_w, d_w, t_max):
        """march_scene clone that returns per-pass steps [n_inst, R]."""
        n_inst = scene.num_instances
        qi = vq.conjugate(scene.inst_rot)[:, None, :]
        o_obj = vq.rotate(qi, (o_w[None] - scene.inst_pos[:, None])
                          / scene.inst_scale[:, None])
        d_obj = vq.rotate(qi, d_w[None] / scene.inst_scale[:, None])
        ext_i = scene.volumes.extends[scene.inst_volume]
        ok, t_enter, _ = ray_aabb(o_obj, d_obj, -ext_i[:, None, None],
                                  ext_i[:, None, None], t_max[None])
        ok = ok & scene.inst_active[:, None]
        key = jnp.where(ok, t_enter, jnp.inf)
        order = jnp.argsort(key, axis=0)
        best_t = jnp.full(o_w.shape[0], jnp.inf)
        steps = []
        for j in range(n_inst):
            inst_j = order[j]
            live = (jnp.take_along_axis(ok, inst_j[None], axis=0)[0]
                    & (jnp.take_along_axis(key, inst_j[None], axis=0)[0]
                       < best_t))
            t_max_j = jnp.where(live, jnp.minimum(t_max, best_t), -jnp.inf)
            sel3 = inst_j[None, :, None]
            o_j = jnp.take_along_axis(o_obj, sel3, axis=0)[0]
            d_j = jnp.take_along_axis(d_obj, sel3, axis=0)[0]
            h = march_lanes(scene.volumes, scene.inst_volume[inst_j],
                            o_j, d_j, t_max_j, interp=True)
            steps.append(h.steps)
            closer = h.hit & (h.t < best_t)
            best_t = jnp.where(closer, h.t, best_t)
        return jnp.stack(steps)

    pad = (-r) % CHUNK
    o_p = jnp.concatenate([o_s, jnp.zeros((pad, 3))]) if pad else o_s
    d_p = jnp.concatenate([d_s, jnp.ones((pad, 3))]) if pad else d_s
    t_p = jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)]) if pad else t_max
    oc = o_p.reshape(-1, CHUNK, 3)
    dc = d_p.reshape(-1, CHUNK, 3)
    tc = t_p.reshape(-1, CHUNK)
    f = jax.jit(lambda s, oc, dc, tc: jax.lax.map(
        lambda x: per_pass_steps(s, *x), (oc, dc, tc)))
    st = np.asarray(f(scene, oc, dc, tc))        # [chunks, n_inst, CHUNK]
    n_inst = st.shape[1]
    tot_active = st.sum()
    lockstep = 0
    for j in range(n_inst):
        mj = st[:, j, :].max(axis=1)             # per-chunk pass-j trip
        lockstep += (mj * CHUNK).sum()
        print(f"  pass {j}: active {st[:, j, :].sum()/r:5.2f}/ray, "
              f"chunk-max mean {mj.mean():6.1f}, p95 "
              f"{np.percentile(mj, 95):6.1f}, max {mj.max()}", flush=True)
    print(f"  total: active {tot_active/r:.2f}/ray, lockstep "
          f"{lockstep/r:.2f}/ray, waste {lockstep/max(tot_active,1):.2f}x",
          flush=True)
    # what would per-pass-compacted cost be? (sum over passes of
    # ceil(live_lanes/CHUNK)*CHUNK*per-chunk-sorted-max, approximated by
    # sorting each pass's per-lane steps descending and re-chunking)
    ideal = 0
    for j in range(n_inst):
        sj = np.sort(st[:, j, :].reshape(-1))[::-1]
        sj = sj[sj > 0]
        padj = (-len(sj)) % CHUNK
        sjp = np.concatenate([sj, np.zeros(padj, sj.dtype)])
        mj = sjp.reshape(-1, CHUNK).max(axis=1)
        ideal += (mj * CHUNK).sum()
        print(f"  pass {j} compacted+sorted lockstep: "
              f"{(mj * CHUNK).sum()/r:5.2f}/ray over "
              f"{len(sj)} live lanes", flush=True)
    print(f"  per-pass compacted+perfect-sort lockstep: {ideal/r:.2f}/ray",
          flush=True)

    # -- C: frame time vs chunk size ----------------------------------------
    for cs in (16384, 32768, 65536, 131072):
        fr = jax.jit(lambda s, cs=cs: render_image(
            s, WIDTH, HEIGHT, mode, chunk_size=cs, sort_rays=True))
        dt = timeit(fr, scene, iters=3, warmup=1)
        print(f"  frame chunk {cs:>6d}: {dt*1e3:8.1f} ms = "
              f"{r/dt/1e6:.2f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
