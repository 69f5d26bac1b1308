"""Scaling-efficiency harness for the model-parallel slab fit
(BASELINE config 5: a 512^3-class brick-sharded SDF, rays sharded over the
mesh, halo exchange + overlapped grad all-reduce).

Measures one `make_slab_fit_step` at model = 1, 2, ..., N on the available
device mesh (real chips, or the virtual CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``)
and reports two efficiencies:

    efficiency          = t(1) / (S * t(S))   # wall-clock speedup retained
    efficiency_work     = t(1) / t(S)         # total-work growth bound

On real chips (one per shard) the first is the scaling number.  On an
oversubscribed virtual mesh (S shards timesharing < S cores, flagged
``oversubscribed``) wall time tracks TOTAL work, so the second is the
meaningful bound: it measures how well the work partition (chord-retired
rays, halo overhead, replicated shade) holds total compute constant as S
grows — a lower bound on real-chip efficiency before ICI/DCN latency.
Prints one JSON line per S plus a summary line.

Usage: python -m vrt.apps.scaling [--res 9] [--rays 4096] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import time


def build_volume(resolution: int):
    """Analytic CSG bake at n = 2^res + 1 (vectorized, no Python loops)."""
    import numpy as np

    from vrt.volume import sdf as S
    from vrt.volume.volume import VoxelVolume

    ext = 100.0
    csg = S.CSG(shape=S.Sphere(radius=0.62 * ext))
    csg.add_child(S.Box(extends=(0.75 * ext, 0.3 * ext, 0.3 * ext),
                        position=np.array([0.0, 0.0, 0.45 * ext],
                                          np.float32)), S.ADD)
    csg.add_child(S.Sphere(radius=0.35 * ext,
                           position=np.array([0.3 * ext, 0.0, 0.0],
                                             np.float32)), S.SUBTRACT)
    return VoxelVolume.from_generator(csg, resolution, ext)


def _per_shard_steps(mesh, slabs, o, d):
    """Per-shard primary-march while_loop step totals — the accounting
    that says whether slab-march work actually partitions (a shard pays
    steps only for rays whose chord crosses its slab + the one-step
    crossings of the out-of-slab spans)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vrt.dist.brick import march_volume_slab
    from vrt.dist.mesh import MODEL_AXIS

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(MODEL_AXIS), P(), P()),
             out_specs=P(MODEL_AXIS))
    def counts(slabs, o, d):
        slab = jax.tree.map(lambda x: x[0], slabs)
        t_max = jnp.full(o.shape[0], 1e4, jnp.float32)
        hit = march_volume_slab(slab, o, d, t_max)
        return jnp.sum(hit.steps)[None]

    return [int(x) for x in counts(slabs, o, d)]


def run(resolution: int, n_rays: int, steps: int, shard_counts=None):
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # The axon sitecustomize pins the TPU platform at interpreter
        # start; the explicit config update wins pre-initialization (same
        # dance as tests/conftest.py and dryrun_multichip).
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vrt.core import quat as vq
    from vrt.dist.brick import shard_volume
    from vrt.dist.mesh import make_render_mesh
    from vrt.dist.slab_render import default_fit_scene, make_slab_fit_step

    n_dev = len(jax.devices())
    if shard_counts is None:
        shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]

    vol = build_volume(resolution)
    n = vol.n_voxels
    print(f"# volume {n}^3 ({n ** 3 * 4 / 1e9:.2f} GB f32), "
          f"{n_rays} rays, {n_dev} devices", flush=True)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = (-dirs * rng.uniform(250.0, 400.0, size=(n_rays, 1))
         ).astype(np.float32)
    o += rng.normal(scale=40.0, size=(n_rays, 3)).astype(np.float32)
    o = jnp.asarray(o)
    d = jnp.asarray(dirs)
    targets = jnp.full((n_rays, 3), 0.4, jnp.float32)
    light = np.asarray(vq.forward_vector(
        vq.from_euler_degrees(0.0, 45.0, -30.0)))

    results = []
    t1 = None
    fit_scene = default_fit_scene(vol.n_voxels, vol.cell_size, vol.extends,
                                  light)
    for s_count in shard_counts:
        mesh = make_render_mesh(1, s_count, jax.devices()[:s_count])
        slabs = shard_volume(vol, s_count)
        optimizer = optax.adam(1e-2)
        step = make_slab_fit_step(mesh, optimizer, fit_scene)
        params = slabs.sdf
        state = optimizer.init(params)
        # warmup/compile
        params, state, loss = step(params, state, slabs, o, d, targets)
        loss = float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, state, loss_j = step(params, state, slabs, o, d,
                                         targets)
        loss = float(loss_j)  # queue drain
        dt = (time.perf_counter() - t0) / steps
        if t1 is None:
            t1 = dt
        eff = t1 / (s_count * dt)
        row = {"model_shards": s_count, "step_s": round(dt, 4),
               "loss": round(loss, 6), "efficiency": round(eff, 3),
               "efficiency_work": round(t1 / dt, 3),
               "march_steps_per_shard": _per_shard_steps(mesh, slabs, o, d)}
        results.append(row)
        print(json.dumps(row), flush=True)

    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:  # pragma: no cover
        cores = os.cpu_count() or 1
    oversub = (jax.devices()[0].platform == "cpu"
               and cores < results[-1]["model_shards"])
    summary = {
        "metric": f"slab-fit scaling efficiency ({n}^3 SDF, "
                  f"{n_rays} rays)",
        "best_shards": results[-1]["model_shards"],
        "efficiency": results[-1]["efficiency"],
        "efficiency_work": results[-1]["efficiency_work"],
        "oversubscribed": oversub, "host_cores": cores}
    print(json.dumps(summary), flush=True)
    return results, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=9,
                    help="volume resolution r (n = 2^r + 1; 9 -> 513^3)")
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--shards", type=int, nargs="*", default=None)
    ap.add_argument("--out", default=None,
                    help="write rows + summary as JSON lines")
    args = ap.parse_args()
    results, summary = run(args.res, args.rays, args.steps, args.shards)
    if args.out:
        with open(args.out, "w") as f:
            for row in results:
                f.write(json.dumps(row) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
