"""Headline benchmark: forward rays/s per chip at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE config 2 scaled to 1080p: a 128^3-class SDF volume
pair (trilinear isosurface march), skybox env shading, directional light
with shadow rays, full lit pipeline.  ``vs_baseline`` is relative to the
reference's published numbers — it published none (BASELINE.md), so the
ratio is reported against this repo's own recorded prior round when
available (BENCH_BASELINE.json), else 1.0.

The measurement runs in a child process with a hard deadline (the axon TPU
runtime can wedge on device faults); on any failure a JSON line with
value 0 and an ``error`` note is still printed.
"""

import json
import os
import subprocess
import sys
import time

WIDTH = int(os.environ.get("VRT_BENCH_W", "1920"))
HEIGHT = int(os.environ.get("VRT_BENCH_H", "1080"))
RESOLUTION = int(os.environ.get("VRT_BENCH_RES", "7"))
CHUNK = int(os.environ.get("VRT_BENCH_CHUNK", "0")) or None
DEADLINE_S = int(os.environ.get("VRT_BENCH_DEADLINE", "2400"))

# Fallback ladder: if a config faults the device or times out, retry smaller
# so the driver always records a real measurement.  The 1080p headline rung
# gets the lion's share of the deadline: round 3's driver artifact silently
# fell back to the 720p rung because rung 1's 800 s share could not absorb a
# cold compile of the full multi-pass pipeline (VERDICT r3 missing #3).
LADDER = [
    dict(W=1920, H=1080, RES=7, CHUNK=8192, SHARE=0.62),
    dict(W=1280, H=720, RES=6, CHUNK=32768, SHARE=0.23),
    dict(W=512, H=512, RES=6, CHUNK=16384, SHARE=0.15),
]


def child():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_scene
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode
    from vrt.render.renderer import trace_radiance, tonemap

    from vrt.render.renderer import render_image

    # Chebyshev distance-map traversal (bigger skips, identical hits) +
    # bf16 fast-march corner table (traversal only; hit resolve stays f32;
    # error comparable to the reference's own 15-bit fixed-point volume
    # encoding, RDXVoxelVolume.cpp:399-421).  VRT_BENCH_EXACT=1 reverts to
    # the bit-exact f32 path.
    fast = os.environ.get("VRT_BENCH_EXACT") != "1"
    scene = _flagship_scene(resolution=RESOLUTION, accel_mode="chebyshev",
                            march_dtype=jnp.bfloat16 if fast else None)
    mode = RenderMode()

    def render(scene):
        return render_image(scene, WIDTH, HEIGHT, mode, chunk_size=CHUNK,
                            sort_rays=True, compact=True)

    import dataclasses

    def jittered(i):
        # every timed dispatch must be UNIQUE: the axon tunnel memoizes
        # identical executions (observed serving repeat frames in 0.3 ms);
        # a 1e-6-degree fov jitter changes nothing measurable but defeats
        # the cache.  Values stay traced (no recompile).
        return dataclasses.replace(scene, cam_fov=scene.cam_fov + i * 1e-6)

    # warmup + compile.  Under the axon runtime block_until_ready can return
    # before execution completes; the scalar readback is the queue drain.
    t0 = time.perf_counter()
    out = render(jittered(0))
    checksum = float(jnp.sum(out))
    print(f"# warmup {time.perf_counter() - t0:.1f}s checksum {checksum:.1f}",
          file=sys.stderr, flush=True)
    assert np.isfinite(checksum), checksum

    iters = 3
    t0 = time.perf_counter()
    outs = [render(jittered(i + 1)) for i in range(iters)]
    _ = float(jnp.sum(outs[-1]))  # device executes in order: drains all
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = WIDTH * HEIGHT / dt
    print(json.dumps({"value": rays_per_s}), flush=True)
    os._exit(0)


def _try_config(cfg, deadline):
    env = dict(os.environ, VRT_BENCH_CHILD="1",
               VRT_BENCH_W=str(cfg["W"]), VRT_BENCH_H=str(cfg["H"]),
               VRT_BENCH_RES=str(cfg["RES"]),
               VRT_BENCH_CHUNK=str(cfg["CHUNK"]))
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=deadline,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                return float(json.loads(line).get("value", 0.0)), None
        return 0.0, (proc.stderr or "")[-400:]
    except subprocess.TimeoutExpired:
        return 0.0, f"deadline {deadline}s exceeded"
    except Exception as e:  # pragma: no cover
        return 0.0, repr(e)


def main():
    if os.environ.get("VRT_BENCH_CHILD") == "1":
        child()
        return

    value = 0.0
    note = None
    used = LADDER[0]
    for cfg in LADDER:
        value, note = _try_config(cfg, max(600, int(DEADLINE_S
                                                    * cfg["SHARE"])))
        used = cfg
        if value > 0.0:
            break
    metric = (f"fwd rays/s/chip @{used['W']}x{used['H']} "
              f"({(1 << used['RES']) + 1}^3 SDF scene, "
              "lit+shadow+reflection+skybox)")

    vs = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if value and os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            if base.get("value"):
                vs = value / float(base["value"])
        except Exception:
            pass

    result = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }
    if note:
        result["error"] = note.strip()[-200:]
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
