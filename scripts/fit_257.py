"""BASELINE config 4 AS WRITTEN: optimize a 257^3 voxel SDF + per-voxel
color field from multi-view images (VERDICT r3 next-round item 3).

Memory-lean configuration at the reference's design-limit resolution
(res 8 = 257^3, ``VOX/Private/VolumeConverter.cpp:43-47``):

- the march corner table is bf16 (halved bytes, quantization comparable
  to the reference's own 15-bit fixed-point volume encoding); at 256^3
  cells it is NOT VMEM-fused, so the split-phase u8-accel fetch carries
  traversal and the in-jit differentiable repack is 9 GB smaller than a
  round-3-style f32 9-channel table would be,
- the fit forward runs the PRODUCTION deferred wavefront pipeline with
  per-chunk remat (``render_views`` -> ``render_image(remat=True)``).

Writes FIT_257.json: loss curve, per-step wall clock, device peak memory.

Usage: python scripts/fit_257.py [--steps 20] [--size 512] [--views 4]
       [--resolution 8]
"""
import argparse
import json
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_fit_scene(resolution: int, seed: int = 0):
    """Single 257^3-class volume + per-voxel color field: a CSG target
    (sphere-minus-box shell) whose fit starts from an inflated sphere."""
    from vrt.core import quat as vq
    from vrt.core.material import Material
    from vrt.render.gpuscene import build_scene
    from vrt.volume import sdf as S
    from vrt.volume.volume import VoxelVolume

    target_csg = S.CSG(shape=S.Sphere(radius=62.0))
    target_csg.add_child(S.Box(extends=(70.0, 26.0, 26.0)), S.SUBTRACT)
    target = VoxelVolume.from_generator(
        target_csg, resolution, 100.0,
        material=Material(albedo=(0.8, 0.8, 0.8, 1.0), roughness=0.8))
    start = VoxelVolume.from_generator(
        S.Sphere(radius=70.0), resolution, 100.0,
        material=Material(albedo=(0.8, 0.8, 0.8, 1.0), roughness=0.8))

    n = target.n_voxels
    rng = np.random.default_rng(seed)
    # low-frequency target color field; start from flat gray
    base = rng.uniform(0.2, 0.9, size=(1, 9, 9, 9, 3)).astype(np.float32)
    grid = np.linspace(0, 8, n)
    idx = np.minimum(grid.astype(np.int32), 7)
    frac = (grid - idx).astype(np.float32)

    def upsample(c):
        for ax in range(3):
            i0 = np.take(c, idx, axis=1 + ax)
            i1 = np.take(c, idx + 1, axis=1 + ax)
            sh = [1] * c.ndim
            sh[1 + ax] = n
            f = frac.reshape(sh)
            c = i0 * (1 - f) + i1 * f
        return c

    target_colors = upsample(base).astype(np.float32)
    start_colors = np.full((1, n, n, n, 3), 0.5, np.float32)

    env = np.full((6, 8, 8, 3), (0.25, 0.45, 0.85), np.float32)
    light = np.asarray(vq.forward_vector(
        vq.from_euler_degrees(0.0, 45.0, -30.0)))

    def scene_for(vol, colors):
        return build_scene(
            [vol], [{"volume": 0}],
            camera={"position": (300.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0))},
            dir_light={"direction": light, "strength": 6.0},
            env=env, voxel_colors=colors,
            accel_mode="octree", march_dtype=jnp.bfloat16)

    return scene_for(target, target_colors), scene_for(start, start_colors)


def orbit_cams(n_views: int, dist: float = 300.0, height: float = 60.0):
    from vrt.core import quat as vq

    cams = []
    for i in range(n_views):
        yaw = 360.0 * i / n_views
        a = np.radians(yaw)
        pos = (dist * np.cos(a), dist * np.sin(a), height)
        pitch = -np.degrees(np.arctan2(height, dist))
        rot = np.asarray(vq.from_euler_degrees(0.0, 180.0 + yaw, pitch))
        cams.append(dict(position=pos, rotation=rot, fov=60.0))
    return cams


def fd_probe(resolution=5, size=64, chunk=1024, eps=0.1, k=3):
    """Finite-difference check of the fit gradient in the SAME memory-lean
    configuration (bf16 corner table, deferred wavefront, remat) at a
    resolution where 2k+1 full losses are affordable.  Returns per-voxel
    (analytic, fd, rel_err) rows for the k largest-|g| SDF voxels."""
    from vrt.diff.fit import graft_params, rebuild_accel, render_views
    from vrt.render.gpuscene import RenderMode

    mode = RenderMode()
    target_scene, scene = build_fit_scene(resolution)
    cams = orbit_cams(2)
    targets = jax.jit(lambda s: render_views(s, cams, size, size, mode,
                                             chunk_size=chunk))(target_scene)

    def loss(p):
        s = rebuild_accel(graft_params(scene, p))
        imgs = render_views(s, cams, size, size, mode, chunk_size=chunk)
        return jnp.mean((imgs - targets) ** 2)

    params = {"sdf": scene.volumes.sdf}
    g = np.asarray(jax.jit(jax.grad(loss))(params)["sdf"])
    base = np.asarray(scene.volumes.sdf)
    loss_j = jax.jit(loss)
    rows = []
    for flat in np.argsort(-np.abs(g).ravel())[:k]:
        idx = np.unravel_index(flat, g.shape)
        p = base.copy()
        p[idx] += eps
        m = base.copy()
        m[idx] -= eps
        fd = (float(loss_j({"sdf": jnp.asarray(p)}))
              - float(loss_j({"sdf": jnp.asarray(m)}))) / (2 * eps)
        a = float(g[idx])
        rows.append(dict(voxel=[int(i) for i in idx], analytic=a, fd=fd,
                         rel_err=abs(fd - a) / max(abs(a), 1e-12)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--lr", type=float, default=8e-2)
    ap.add_argument("--out", default=os.path.join(REPO, "FIT_257.json"))
    args = ap.parse_args()

    import optax

    from vrt.diff.fit import make_fit_step, render_views
    from vrt.render.gpuscene import RenderMode

    mode = RenderMode()
    target_scene, scene = build_fit_scene(args.resolution)
    n = int(target_scene.volumes.n[0])
    cams = orbit_cams(args.views)
    w = h = args.size

    t0 = time.perf_counter()
    targets = jax.jit(
        lambda s: render_views(s, cams, w, h, mode, chunk_size=args.chunk)
    )(target_scene)
    targets = jax.block_until_ready(targets)
    t_targets = time.perf_counter() - t0
    print(f"rendered {args.views} target views {w}x{h} at {n}^3: "
          f"{t_targets:.1f}s (incl. compile)", flush=True)

    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    # cosine-decayed adam: the plateau after the first ~15 steps is
    # noise-dominated (each voxel sees few rays per view); decaying the
    # step keeps the curve descending instead of oscillating
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps, 0.1))
    state = opt.init(params)
    step = make_fit_step(scene, cams, w, h, mode, opt,
                         chunk_size=args.chunk)

    losses, times = [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        params, state, loss = step(params, state, targets)
        loss = float(loss)
        dt = time.perf_counter() - t0
        losses.append(loss)
        times.append(dt)
        print(f"step {i}: loss {loss:.6f}  {dt:.1f}s", flush=True)
        assert np.isfinite(loss), loss

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if "bytes" in k or "limit" in k}
    except Exception as e:  # noqa: BLE001
        mem = {"unavailable": repr(e)}

    print("FD grad probe (res 5, same bf16/deferred/remat config)...",
          flush=True)
    fd_rows = fd_probe()
    for r in fd_rows:
        print(f"  voxel {r['voxel']}: analytic {r['analytic']:.3e} "
              f"fd {r['fd']:.3e} rel_err {r['rel_err']:.3f}", flush=True)

    steady = sorted(times[1:])[:max(1, (len(times) - 1) // 2)]
    rays = args.views * w * h
    report = {
        "resolution": args.resolution, "grid": f"{n}^3",
        "views": args.views, "image": f"{w}x{h}",
        "rays_per_step": rays,
        "march_dtype": "bfloat16",
        "corner_table_mb": round((n - 1) ** 3 * 8 * 2 / 1e6, 1),
        "steps": args.steps,
        "losses": [round(l, 6) for l in losses],
        "step_seconds": [round(t, 2) for t in times],
        "steady_step_s": round(float(np.mean(steady)), 2),
        "rays_per_s_fwd_bwd": round(rays / float(np.mean(steady)), 0),
        "target_render_s": round(t_targets, 1),
        "fd_grad_probe_res5": fd_rows,
        "device_memory": mem,
        "loss_drop_pct": round(100.0 * (1.0 - losses[-1] / losses[0]), 1),
        "descending": all(b <= a + 1e-5 for a, b in
                          zip(losses, losses[1:])),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("losses", "step_seconds")}), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
