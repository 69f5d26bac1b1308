"""Interactive-loop fps measurement (VERDICT r4 item 4: >= 10 fps @512^2).

Runs the demo scene through the REAL engine loop (tick -> incremental
sync -> render -> pipelined u8 readback) for N frames and reports
steady-state fps at 512^2 and 1280x720; dumps a frame to assets/.

Usage: python scripts/probe_demo_fps.py [--frames 40]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(width, height, frames, save=None, render_scale=1.0):
    import numpy as np

    from vrt.apps.demo import DemoInstance
    from vrt.engine.engine import Engine

    inst = DemoInstance()
    engine = Engine(inst, width=width, height=height,
                    render_scale=render_scale)
    times = []
    t_last = [None]

    def cb(e):
        now = time.perf_counter()
        if t_last[0] is not None:
            times.append(now - t_last[0])
        t_last[0] = now

    engine.start(max_frames=frames, frame_callback=cb)
    steady = sorted(times[2:])[:max(1, (len(times) - 2) * 3 // 4)]
    fps = 1.0 / (sum(steady) / len(steady))
    tag = "" if render_scale == 1.0 else f" (motion scale {render_scale})"
    print(f"{width}x{height}{tag}: {fps:.1f} fps steady "
          f"(first frame incl. compile {times[0]:.1f}s)", flush=True)
    if save and engine.last_frame is not None:
        from vrt.io.image import write_png
        write_png(save, engine.last_frame[..., :3])
        print(f"wrote {save}", flush=True)
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()
    run(512, 512, args.frames,
        save=os.path.join(REPO, "assets", "demo_512_r5.png"))
    run(512, 512, args.frames, render_scale=0.71,
        save=os.path.join(REPO, "assets", "demo_512_motion_r5.png"))
    run(1280, 720, max(10, args.frames // 2))
    os._exit(0)


if __name__ == "__main__":
    main()
