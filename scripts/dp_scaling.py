"""Ray/data-axis scaling artifact (VERDICT r4 item 5 — the model axis has
SCALING.json; this is the matching artifact for the ray-DP axis).

Runs the flagship scene's render AND the DP fit step with rays sharded
over D = 1, 2, 4, 8 mesh devices (virtual CPU mesh under
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``,
same stand-in the driver's dryrun uses), with per-shard march-step
counters — the work-based accounting that shows whether the ray partition
balances.  On the oversubscribed CPU host wall-clock tracks TOTAL work
(same caveat as SCALING.json), so ``efficiency_work`` = t(1)/t(D) is the
meaningful bound; per-shard step spread bounds the real-chip load
imbalance.

Writes DPSCALING.json.  Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/dp_scaling.py [--size 256] [--steps 3]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flag = "--xla_force_host_platform_device_count"
if flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" {flag}=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _per_shard_steps(mesh, scene, o, d, interleave):
    """Per-shard primary-march step totals under the ray sharding."""
    import math
    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vrt.dist.sharding import _interleave_perm, _ray_spec
    from vrt.render.renderer import RADIANCE_TMAX, march_scene

    spec = _ray_spec(mesh)
    if interleave:
        perm, _ = _interleave_perm(o.shape[0],
                                   math.prod(mesh.devices.shape))
        o, d = o[perm], d[perm]

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), spec, spec),
             out_specs=spec)
    def counts(scene, o, d):
        t_max = jnp.full(o.shape[0], RADIANCE_TMAX, jnp.float32)
        hit, _ = march_scene(scene, o, d, t_max, True)
        return jnp.sum(hit.steps)[None]

    return [int(x) for x in counts(scene, o, d)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--resolution", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(REPO, "DPSCALING.json"))
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_scene
    from vrt.dist.mesh import make_render_mesh
    from vrt.dist.sharding import make_fit_step_dp, render_image_sharded
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode

    mode = RenderMode()
    n_dev = len(jax.devices())
    shard_counts = [s for s in (1, 2, 4, 8) if s <= n_dev]
    scene = _flagship_scene(resolution=args.resolution, use_colors=True)
    w = h = args.size
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, w, h)
    targets = jnp.full((w * h, 3), 0.3, jnp.float32)

    rows = []
    t1_render = t1_fit = None
    for s_count in shard_counts:
        mesh = make_render_mesh(s_count, 1, jax.devices()[:s_count])

        def render():
            return render_image_sharded(scene, w, h, mode, mesh)

        img = jax.block_until_ready(render())  # compile
        t0 = time.perf_counter()
        for _ in range(args.steps):
            img = render()
        jax.block_until_ready(img)
        dt_render = (time.perf_counter() - t0) / args.steps

        params = {"sdf": scene.volumes.sdf,
                  "voxel_colors": scene.voxel_colors}
        opt = optax.adam(1e-2)
        state = opt.init(params)
        step = make_fit_step_dp(mode, mesh, opt)
        params, state, loss = step(params, state, scene, o, d, targets)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, state, loss = step(params, state, scene, o, d, targets)
        loss = float(loss)
        dt_fit = (time.perf_counter() - t0) / args.steps

        steps_blocked = _per_shard_steps(mesh, scene, o, d, False)
        steps_rr = _per_shard_steps(mesh, scene, o, d, True)
        if t1_render is None:
            t1_render, t1_fit = dt_render, dt_fit
        row = {
            "data_shards": s_count,
            "render_s": round(dt_render, 4),
            "fit_step_s": round(dt_fit, 4),
            "loss": round(loss, 6),
            "efficiency_render": round(t1_render / (s_count * dt_render), 3),
            "efficiency_work_render": round(t1_render / dt_render, 3),
            "efficiency_work_fit": round(t1_fit / dt_fit, 3),
            "march_steps_per_shard": steps_rr,
            "imbalance_blocked": round(
                max(steps_blocked) / max(float(np.mean(steps_blocked)),
                                         1.0), 3),
            "imbalance_interleaved": round(
                max(steps_rr) / max(float(np.mean(steps_rr)), 1.0), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:  # pragma: no cover
        cores = os.cpu_count() or 1
    oversub = (jax.devices()[0].platform == "cpu"
               and cores < shard_counts[-1])
    summary = {
        "metric": f"ray-DP scaling ({args.size}x{args.size} render + DP "
                  f"fit step, {2 ** args.resolution + 1}^3 scene)",
        "best_shards": rows[-1]["data_shards"],
        "efficiency_render": rows[-1]["efficiency_render"],
        "efficiency_work_render": rows[-1]["efficiency_work_render"],
        "efficiency_work_fit": rows[-1]["efficiency_work_fit"],
        "imbalance_blocked": rows[-1]["imbalance_blocked"],
        "imbalance_interleaved": rows[-1]["imbalance_interleaved"],
        "oversubscribed": oversub, "host_cores": cores,
        "note": "virtual 8-device CPU mesh; wall clock is "
                "oversubscription-bound like SCALING.json — "
                "efficiency_work is the meaningful bound, per-shard step "
                "spread bounds real-chip load imbalance",
    }
    print(json.dumps(summary), flush=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
