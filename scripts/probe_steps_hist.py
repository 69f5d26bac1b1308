"""Round-4 probe: per-lane active-step distribution of the flagship 1080p
frame's marches (primary per candidate pass, shadow, bounce), and an exact
offline simulation of mid-march live-lane compaction (re-packing still-live
lanes into dense chunks every K iterations) to pick a schedule and bound
the attainable lockstep-row reduction BEFORE building the machinery
(VERDICT r3 next-round item 4)."""
import os
import sys

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


def lockstep_rows(steps, chunk, cap=255):
    """Exact lockstep rows of chunked marching in the given lane order:
    each chunk runs to its slowest live lane (<= cap)."""
    n = len(steps)
    pad = (-n) % chunk
    s = np.concatenate([steps, np.zeros(pad, steps.dtype)])
    per_chunk = np.minimum(s.reshape(-1, chunk).max(1), cap)
    return int(per_chunk.sum() * chunk), int(np.minimum(s, cap).sum())


def simulate_compaction(steps, chunk, schedule):
    """Lanes keep relative order; every round still-live lanes pack to the
    front and march in `chunk`-wide chunks for up to K iters; all-dead
    chunks are free (cond-skip).  Returns total lockstep rows."""
    remaining = np.minimum(steps.astype(np.int64), 255).copy()
    total = 0
    for k in schedule:
        live = remaining > 0
        r = remaining[live]          # compacted, order-preserving
        if len(r) == 0:
            break
        pad = (-len(r)) % chunk
        rp = np.concatenate([r, np.zeros(pad, r.dtype)])
        per_chunk = np.minimum(rp.reshape(-1, chunk).max(1), k)
        total += int(per_chunk.sum() * chunk)
        remaining[live] = np.maximum(r - k, 0)
    return total


def main():
    from __graft_entry__ import _flagship_scene
    from vrt.core import quat as vq
    from vrt.march.march import march_lanes, ray_aabb
    from vrt.march.types import MarchHit
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import (_scene_hit_key, _world_to_object,
                                     march_scene, trace_radiance,
                                     RADIANCE_TMAX, DIR_SHADOW_TMAX)
    import dataclasses

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, W, H)
    perm = jnp.argsort(_scene_hit_key(scene, o, d), stable=True)
    o, d = o[perm], d[perm]

    # ---- primary march per candidate pass (replicates march_scene) ----
    @jax.jit
    def primary_pass_steps(o_w, d_w):
        n_inst = scene.num_instances
        t_max = jnp.full(o_w.shape[0], RADIANCE_TMAX)
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
        best = MarchHit.none_like(o_w)
        out = []
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
            out.append(h.steps)
            closer = h.hit & (h.t < best_t)
            h = dataclasses.replace(h, steps=None)
            best = h.select(closer, best)
            best_t = jnp.where(closer, h.t, best_t)
        return jnp.stack(out), best, best_t

    steps_pp, best, best_t = primary_pass_steps(o, d)
    steps_pp = np.asarray(steps_pp)

    for name, steps in [("pass0", steps_pp[0]), ("pass1", steps_pp[1]),
                        ("sum", steps_pp.sum(0))]:
        q = np.percentile(steps, [50, 75, 90, 99, 99.9, 100])
        nz = (steps > 0).mean()
        print(f"primary {name}: live {nz:.3f}  mean {steps.mean():.2f}  "
              f"p50/75/90/99/99.9/max {q}", flush=True)

    total = W * H
    for chunk in (8192, 16384, 65536):
        base_sum = 0
        active_sum = 0
        for j in range(steps_pp.shape[0]):
            ls, act = lockstep_rows(steps_pp[j], chunk)
            base_sum += ls
            active_sum += act
        print(f"chunk {chunk}: baseline lockstep {base_sum/total:.2f} "
              f"rows/ray (active {active_sum/total:.2f})", flush=True)
        for schedule in [(4, 251), (4, 12, 239), (2, 6, 24, 223),
                         (4, 12, 48, 191), (8, 56, 191), (6, 24, 225),
                         (3, 9, 27, 81, 135)]:
            sim = sum(simulate_compaction(steps_pp[j], chunk, schedule)
                      for j in range(steps_pp.shape[0]))
            print(f"  compact {schedule}: {sim/total:.2f} rows/ray "
                  f"({base_sum/max(sim,1):.2f}x fewer)", flush=True)

    # ---- shadow rays (primary hits only, like the deferred pass) -------
    hitmask = np.asarray(best.hit)
    t_res = np.asarray(jnp.where(best.hit, best_t, 0.0))
    hp = np.asarray(o) + np.asarray(d) * t_res[:, None]
    so = jnp.asarray(hp - np.asarray(d) * 0.1)
    sd = jnp.broadcast_to(scene.dir_light_dir, so.shape)
    maxd = jnp.where(jnp.asarray(hitmask), DIR_SHADOW_TMAX, -jnp.inf)

    @jax.jit
    def shadow_steps(so, sd, maxd):
        h, _ = march_scene(scene, so, sd, maxd, True)
        return h.steps

    ssteps = np.asarray(shadow_steps(so, sd, maxd))
    q = np.percentile(ssteps, [50, 90, 99, 100])
    print(f"shadow: live {(ssteps>0).mean():.3f} mean {ssteps.mean():.2f} "
          f"p50/90/99/max {q}", flush=True)
    for chunk in (8192, 65536):
        ls, act = lockstep_rows(ssteps, chunk)
        sim = simulate_compaction(ssteps, chunk, (4, 12, 48, 191))
        print(f"  shadow chunk {chunk}: lockstep {ls/total:.2f} active "
              f"{act/total:.2f} compact(4,12,48,191) {sim/total:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
