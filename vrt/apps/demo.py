"""Demo application — the ``RendererEngineInstance`` equivalent.

Reproduces the reference demo (``VR/App/Private/RendererEngineInstance.cpp``)
headlessly: loads a ``.vox`` scene when given one (the reference loads
``Resources/Model/Monkey.vox``), spawns the camera at (300,0,100) yaw 180deg,
a directional light at yaw 45 pitch -30 strength 6, and two procedurally
baked spheres (resolution 6, extends 100; red roughness-0.1 metallic-0.6 and
blue default) orbiting at 10 and 50 deg/s (``:111-130, 232-316``).

Run: ``python -m vrt.apps.demo [--scene x.vox] [--frames N] [--out dir]``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.engine.engine import Engine, EngineInstance
from vrt.render.gpuscene import RenderMode
from vrt.scene.scene import Camera, DirectionalLight, Scene, VoxelObject
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


class DemoInstance(EngineInstance):
    """Headless port of ``RendererEngineInstance`` including the key-toggled
    render-mode selection (keys 1/2/3 flip CubeMode / ShowTextures / Unlit,
    ``RendererEngineInstance.cpp:78-109``) via the vrt.ui input bus."""

    def __init__(self, scene_path: str | None = None,
                 out_dir: str | None = None, save_every: int = 0):
        self.scene_path = scene_path
        self.out_dir = out_dir
        self.save_every = save_every
        self.sphere1: VoxelObject | None = None
        self.sphere2: VoxelObject | None = None
        self.angle1 = 0.0
        self.angle2 = 0.0
        self.cube_mode = False
        self.show_textures = True
        self.unlit = False
        self.window = None
        self._engine: Engine | None = None

    def _apply_mode(self) -> None:
        if self._engine is not None:
            self._engine.set_render_mode(RenderMode(
                interp=not self.cube_mode, textured=self.show_textures,
                lit=not self.unlit))

    def _on_key(self, key) -> None:
        from vrt.ui import Key

        if key == Key.K1:
            self.cube_mode = not self.cube_mode
        elif key == Key.K2:
            self.show_textures = not self.show_textures
        elif key == Key.K3:
            self.unlit = not self.unlit
        else:
            return
        self._apply_mode()

    def on_engine_initialized(self, engine: Engine) -> None:
        from vrt.ui import new_window

        self._engine = engine
        self._dt = 1.0 / 60.0
        self._yaw = 180.0
        self._pitch = 0.0
        self.window = new_window(width=engine.width, height=engine.height)
        self.window.events.on_key_pressed.append(self._on_key)
        self.window.events.on_key_down.append(self._on_key_held)
        self.window.events.on_axis_input.append(self._on_axis)
        if self.scene_path:
            from vrt.io.voxfile import load_scene
            scene = load_scene(self.scene_path)
        else:
            scene = Scene()

        scene.spawn(Camera(
            position=np.asarray([300.0, 0.0, 100.0], np.float32),
            rotation=np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0))))
        if scene.active_directional_light is None:
            scene.spawn(DirectionalLight(
                rotation=np.asarray(vq.from_euler_degrees(0.0, 45.0, -30.0)),
                strength=6.0))

        # skybox (RendererEngineInstance.cpp:243 loads Skybox.dds): the
        # shipped generated cubemap if present, else a flat sky color
        if scene.environment is None:
            sky = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "assets",
                "skybox.dds")
            if os.path.exists(sky):
                from vrt.render.texture_factory import \
                    load_texture_cube_from_file
                scene.environment = load_texture_cube_from_file(sky)
            else:
                scene.environment = np.full((6, 1, 1, 3), (0.25, 0.45, 0.85),
                                            np.float32)

        red = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 6, 100.0,
            material=Material(albedo=(1.0, 0.2, 0.2, 1.0), roughness=0.1,
                              metallic=0.6))
        blue = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 6, 100.0,
            material=Material(albedo=(0.2, 0.2, 1.0, 1.0)))
        self.sphere1 = scene.spawn(VoxelObject(
            volume=red, position=np.asarray([0.0, -150.0, 0.0], np.float32)))
        self.sphere2 = scene.spawn(VoxelObject(
            volume=blue, position=np.asarray([0.0, 150.0, 0.0], np.float32)))
        engine.set_scene(scene)

    def _on_key_held(self, key) -> None:
        from vrt.ui import Key

        # WASD fly camera (RendererEngineInstance input bindings :133-209)
        cam = self._engine.scene.active_camera if self._engine and             self._engine.scene else None
        if cam is None:
            return
        speed = 200.0 * self._dt
        fwd = np.asarray(vq.forward_vector(np.asarray(cam.rotation)))
        right = np.asarray(vq.right_vector(np.asarray(cam.rotation)))
        up = np.asarray([0.0, 0.0, 1.0], np.float32)
        if key == Key.W:
            cam.position = cam.position + fwd * speed
        elif key == Key.S:
            cam.position = cam.position - fwd * speed
        elif key == Key.A:
            cam.position = cam.position - right * speed
        elif key == Key.D:
            cam.position = cam.position + right * speed
        elif key == Key.Q:
            cam.position = cam.position + up * speed
        elif key == Key.E:
            cam.position = cam.position - up * speed

    def _on_axis(self, axis: str, value: float) -> None:
        # mouse-look: yaw/pitch deltas (raw-input axis events)
        cam = self._engine.scene.active_camera if self._engine and             self._engine.scene else None
        if cam is None:
            return
        if axis == "MouseX":
            self._yaw = (self._yaw + value * 0.2) % 360.0
        elif axis == "MouseY":
            self._pitch = float(np.clip(self._pitch - value * 0.2, -89, 89))
        cam.rotation = np.asarray(
            vq.from_euler_degrees(0.0, self._yaw, self._pitch))

    def on_engine_update(self, engine: Engine, dt: float) -> None:
        self._dt = dt
        if self.window is not None:
            self.window.tick(dt)
        # orbit the spheres at 10 deg/s and 50 deg/s (:111-130)
        self.angle1 = (self.angle1 + 10.0 * dt) % 360.0
        self.angle2 = (self.angle2 + 50.0 * dt) % 360.0
        for obj, ang, radius in ((self.sphere1, self.angle1, 150.0),
                                 (self.sphere2, self.angle2, 150.0)):
            if obj is not None:
                a = np.deg2rad(ang)
                obj.position = np.asarray(
                    [radius * np.sin(a), radius * np.cos(a), 0.0], np.float32)

        if (self.out_dir and self.save_every
                and engine.frame_count % self.save_every == 0
                and engine.last_frame is not None):
            from vrt.io.image import write_png
            write_png(os.path.join(
                self.out_dir, f"frame_{engine.frame_count:05d}.png"),
                engine.last_frame)


def main(argv=None):
    ap = argparse.ArgumentParser(description="vrt demo (headless)")
    ap.add_argument("--scene", default=None, help=".vox scene to load")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--mode", type=int, default=0,
                    help="EVRenderMode 0-7")
    ap.add_argument("--out", default=None, help="directory for PNG frames")
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--render-scale", type=float, default=1.0,
                    help="motion-resolution mode: render at this scale and "
                         "upsample on device (e.g. 0.71 halves ray count)")
    args = ap.parse_args(argv)

    from vrt.core.platform import apply_platform_env
    apply_platform_env()

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    inst = DemoInstance(args.scene, args.out, args.save_every)
    engine = Engine(inst, width=args.width, height=args.height,
                    mode=RenderMode.from_enum(args.mode),
                    render_scale=args.render_scale)
    engine.start(max_frames=args.frames)
    print(f"rendered {engine.frame_count} frames at {engine.fps:.1f} fps")


if __name__ == "__main__":
    main()
