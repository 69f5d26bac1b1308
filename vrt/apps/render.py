"""Render CLI: ``.vox`` scene (or built-in demo scene) -> PNG image(s).

``python -m vrt.apps.render scene.vox -o out.png [--mode 0-7]
 [--turntable N]``
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from vrt.core import quat as vq
from vrt.io.image import write_png
from vrt.render.gpuscene import RenderMode
from vrt.render.renderer import render_image
from vrt.scene.scene import Camera, DirectionalLight, Scene


def main(argv=None):
    ap = argparse.ArgumentParser(description="vrt renderer")
    ap.add_argument("scene", nargs="?", default=None, help=".vox file")
    ap.add_argument("-o", "--out", default="render.png")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--mode", type=int, default=0, help="EVRenderMode 0-7")
    ap.add_argument("--debug-overlay", action="store_true",
                    help="draw octree-node bounds (SHADER_DEBUG)")
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--camera", type=float, nargs=3,
                    default=(300.0, 0.0, 100.0))
    ap.add_argument("--yaw", type=float, default=180.0)
    ap.add_argument("--pitch", type=float, default=0.0)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--turntable", type=int, default=0,
                    help="render N frames orbiting the scene")
    ap.add_argument("--env", default=None,
                    help="DDS cubemap for the sky (Skybox.dds equivalent)")
    ap.add_argument("--env-color", type=float, nargs=3, default=None,
                    help="flat sky color (linear rgb)")
    args = ap.parse_args(argv)

    from vrt.core.platform import apply_platform_env
    apply_platform_env()

    if args.scene:
        from vrt.io.voxfile import load_scene
        scene = load_scene(args.scene)
    else:
        from vrt.apps.demo import DemoInstance
        from vrt.engine.engine import Engine
        inst = DemoInstance()
        eng = Engine(inst, width=args.width, height=args.height)
        inst.on_engine_initialized(eng)
        scene = eng.scene

    if scene.active_directional_light is None:
        scene.spawn(DirectionalLight(
            rotation=np.asarray(vq.from_euler_degrees(0.0, 45.0, -30.0)),
            strength=6.0))

    if args.env:
        from vrt.render.texture_factory import load_texture_cube_from_file
        scene.environment = load_texture_cube_from_file(args.env)
    elif args.env_color:
        scene.environment = np.full((6, 1, 1, 3), args.env_color,
                                    np.float32)

    mode = RenderMode.from_enum(args.mode)
    if args.debug_overlay:
        import dataclasses
        mode = dataclasses.replace(mode, debug_overlay=True)

    frames = max(1, args.turntable)
    for i in range(frames):
        yaw = args.yaw + (360.0 * i / frames if args.turntable else 0.0)
        cam = Camera(position=np.asarray(args.camera, np.float32),
                     rotation=np.asarray(
                         vq.from_euler_degrees(0.0, yaw, args.pitch)),
                     fov=args.fov)
        scene.active_camera = cam
        t0 = time.perf_counter()
        img = np.asarray(render_image(scene.to_gpu(), args.width,
                                      args.height, mode,
                                      chunk_size=args.chunk))
        dt = time.perf_counter() - t0
        out = args.out if frames == 1 else \
            args.out.replace(".png", f"_{i:03d}.png")
        write_png(out, img)
        print(f"{out}: {args.width}x{args.height} in {dt:.2f}s "
              f"({args.width*args.height/dt/1e6:.2f} Mrays/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
