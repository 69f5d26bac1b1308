"""XProf op-level profile of the config6 fwd+bwd step: capture a device
trace of one grad step and print the top HLO ops by self time — the
op-level evidence behind BENCH.md's backward phase table.

Usage: python scripts/probe_backward_trace.py [--what sdf|colors|both|fwd]
"""
import argparse
import glob
import os
import sys

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both",
                    choices=["sdf", "colors", "both", "fwd"])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/vrt_xprof")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_scene
    from vrt.diff.fit import graft_params, rebuild_accel, render_views
    from vrt.render.gpuscene import RenderMode

    mode = RenderMode()
    scene = _flagship_scene(resolution=6, use_colors=True)
    cams = [dict(position=(320.0, 0.0, 40.0),
                 rotation=np.asarray([0.0, 0.0, 1.0, 0.0], np.float32),
                 fov=60.0)]
    w, h = args.width, args.height
    targets = jnp.zeros((len(cams), w * h, 3), jnp.float32)

    def loss_fn(p):
        s = rebuild_accel(graft_params(scene, p))
        imgs = render_views(s, cams, w, h, mode, chunk_size=args.chunk)
        return jnp.mean((imgs - targets) ** 2)

    params = {"sdf": scene.volumes.sdf, "voxel_colors": scene.voxel_colors}
    if args.what == "fwd":
        fn = jax.jit(loss_fn)
        arg = params
    elif args.what == "both":
        fn = jax.jit(jax.value_and_grad(loss_fn))
        arg = params
    elif args.what == "sdf":
        fn = jax.jit(jax.value_and_grad(
            lambda s: loss_fn({"sdf": s, "voxel_colors":
                               jax.lax.stop_gradient(
                                   params["voxel_colors"])})))
        arg = params["sdf"]
    else:
        fn = jax.jit(jax.value_and_grad(
            lambda c: loss_fn({"sdf": jax.lax.stop_gradient(params["sdf"]),
                               "voxel_colors": c})))
        arg = params["voxel_colors"]

    out = fn(arg)  # compile
    jax.block_until_ready(out)

    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        out = fn(arg)
        jax.block_until_ready(out)

    # ---- parse the xplane and print top ops by self time -----------------
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {args.logdir}"
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    import json

    gviz = json.loads(data)
    ids = [c["id"] for c in gviz["cols"]]
    rows = [dict(zip(ids, [c["v"] if c else None for c in r["c"]]))
            for r in gviz["rows"]]
    agg = {}
    for r in rows:
        try:
            t = float(r["total_self_time"])
        except (TypeError, ValueError):
            continue
        name = (r.get("category") or "?",
                str(r.get("hlo_op_expression"))[:140])
        agg[name] = agg.get(name, 0.0) + t
    total = sum(agg.values())
    print(f"total device self time: {total/1e3:.1f} ms  ({args.what})")
    bycat = {}
    for (cat, _), t in agg.items():
        bycat[cat] = bycat.get(cat, 0.0) + t
    print("\nby category:")
    for cat, t in sorted(bycat.items(), key=lambda x: -x[1]):
        print(f"  {cat:>28}: {t/1e3:9.2f} ms  {100*t/total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for (cat, name), t in sorted(agg.items(), key=lambda x: -x[1])[:args.top]:
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  [{cat}] {name}")
    os._exit(0)


if __name__ == "__main__":
    main()
