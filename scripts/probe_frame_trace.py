"""XProf op-level profile of the flagship 1080p forward frame (bf16,
chebyshev, compact wavefront) — the evidence behind forward-path tuning.

Usage: python scripts/probe_frame_trace.py [--top 40]
"""
import argparse
import dataclasses
import glob
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/vrt_xprof_fwd")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_scene
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import render_image

    scene = _flagship_scene(resolution=7, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16)
    w, h = 1920, 1080

    def frame(i):
        s = dataclasses.replace(scene, cam_fov=scene.cam_fov + i * 1e-6)
        return render_image(s, w, h, RenderMode(), chunk_size=8192,
                            sort_rays=True, compact=True)

    _ = float(jnp.sum(frame(0)))  # compile + fresh exec

    shutil.rmtree(args.logdir, ignore_errors=True)
    with jax.profiler.trace(args.logdir):
        _ = float(jnp.sum(frame(1)))  # unique dispatch inside the trace

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _m = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
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
                str(r.get("hlo_op_expression"))[:130])
        agg[name] = agg.get(name, 0.0) + t
    total = sum(agg.values())
    print(f"total device self time: {total/1e3:.1f} ms")
    bycat = {}
    for (c, _n), t in agg.items():
        bycat[c] = bycat.get(c, 0.0) + t
    print("\nby category:")
    for c, t in sorted(bycat.items(), key=lambda x: -x[1]):
        print(f"  {c:>28}: {t/1e3:9.2f} ms {100*t/total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for (c, n), t in sorted(agg.items(), key=lambda x: -x[1])[:args.top]:
        print(f"  {t/1e3:8.2f} ms {100*t/total:4.1f}% [{c}] {n}")
    os._exit(0)


if __name__ == "__main__":
    main()
