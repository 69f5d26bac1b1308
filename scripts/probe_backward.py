"""Phase attribution for the config6 backward (fit step @1920x1080).

VERDICT r4 item 1: the forward has a full phase table in BENCH.md; the
backward had a single number.  This probe decomposes the fwd+bwd step by
stop-gradient ablation: each variant removes one gradient path, and the
difference to the full step attributes that path's backward cost.

Variants (all jitted, same scene/chunking as ``bench.py --configs 6``):
  fwd            loss eval only
  full           value_and_grad wrt {sdf, voxel_colors} + adam update
  grad_only      value_and_grad without the optimizer update
  colors_only    grad wrt voxel_colors (sdf stop-grad at graft)
  sdf_only       grad wrt sdf (colors stop-grad)
  sdf_no_normal  sdf grad with central-difference normals stop-graded
                 (removes 6 of the ~8 corner-gather transposes)
  sdf_no_ift     sdf grad with the IFT t-correction stop-graded too
                 (hit t and normal both constant -> only shading-side
                 corner reads remain)

Usage: python scripts/probe_backward.py [--width 1920] [--height 1080]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    return float(jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda v: jnp.sum(jnp.abs(v)), x)))


def _time(fn, iters=3):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import optax

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import graft_params, rebuild_accel, render_views
    from vrt.march import resolve as _resolve
    from vrt.render.gpuscene import RenderMode

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    cams = [dict(position=(320.0, 0.0, 40.0),
                 rotation=np.asarray([0.0, 0.0, 1.0, 0.0], np.float32),
                 fov=60.0)]
    w, h = args.width, args.height
    targets = jnp.zeros((len(cams), w * h, 3), jnp.float32)
    rays = len(cams) * w * h

    def loss_fn(p):
        s = rebuild_accel(graft_params(scene, p))
        imgs = render_views(s, cams, w, h, mode, chunk_size=args.chunk)
        return jnp.mean((imgs - targets) ** 2)

    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    opt = optax.adam(1e-2)
    state = opt.init(params)

    rows = []

    def report(label, dt):
        rows.append((label, dt))
        print(f"{label:>14}: {dt*1e3:8.1f} ms  "
              f"{rays/dt/1e6:6.3f} Mrays/s", flush=True)

    # fwd only
    fwd = jax.jit(loss_fn)
    report("fwd", _time(lambda: fwd(params), args.iters))

    # grad only (no optimizer)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    report("grad_only", _time(lambda: vg(params), args.iters))

    # full step
    @jax.jit
    def full(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), new_state, loss

    report("full", _time(lambda: full(params, state), args.iters))

    # colors-only / sdf-only
    def loss_colors(c):
        return loss_fn({"sdf": jax.lax.stop_gradient(params["sdf"]),
                        "voxel_colors": c})

    vg_c = jax.jit(jax.value_and_grad(loss_colors))
    report("colors_only", _time(lambda: vg_c(params["voxel_colors"]),
                                args.iters))

    def loss_sdf(s):
        return loss_fn({"sdf": s, "voxel_colors":
                        jax.lax.stop_gradient(params["voxel_colors"])})

    vg_s = jax.jit(jax.value_and_grad(loss_sdf))
    report("sdf_only", _time(lambda: vg_s(params["sdf"]), args.iters))

    # ablate the central-difference normal gradient (6 corner gathers)
    orig_normal = _resolve.iso.central_difference_normal

    def normal_sg(cfetch, cell, p):
        return jax.lax.stop_gradient(orig_normal(cfetch, cell, p))

    _resolve.iso.central_difference_normal = normal_sg
    try:
        vg_nn = jax.jit(jax.value_and_grad(loss_sdf))
        report("sdf_no_normal", _time(lambda: vg_nn(params["sdf"]),
                                      args.iters))

        # additionally ablate the IFT t gradient: resolve returns
        # stop-grad t for surface hits
        orig_resolve = _resolve.resolve_hits

        def resolve_sg(*a, **k):
            t, n, u = orig_resolve(*a, **k)
            return jax.lax.stop_gradient(t), n, u

        import vrt.render.renderer as _rend
        orig_rend_resolve = _rend.resolve_hits
        _rend.resolve_hits = lambda *a, **k: resolve_sg(*a, **k)
        try:
            vg_ni = jax.jit(jax.value_and_grad(loss_sdf))
            report("sdf_no_ift", _time(lambda: vg_ni(params["sdf"]),
                                       args.iters))
        finally:
            _rend.resolve_hits = orig_rend_resolve
    finally:
        _resolve.iso.central_difference_normal = orig_normal

    print("\nattribution (difference to grad_only):", flush=True)
    base = dict(rows)["grad_only"]
    for label, dt in rows:
        print(f"  {label:>14}: {dt*1e3:8.1f} ms   "
              f"delta {((base - dt))*1e3:+8.1f} ms", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
