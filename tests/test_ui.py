"""UI layer: headless window input contract + demo key toggles."""

import numpy as np

from vrt.ui import HeadlessWindow, Key, new_window


class TestHeadlessWindow:
    def test_edge_vs_held_semantics(self):
        w = new_window(width=32, height=32)
        pressed, down, released = [], [], []
        w.events.on_key_pressed.append(pressed.append)
        w.events.on_key_down.append(down.append)
        w.events.on_key_released.append(released.append)

        w.inject_key_press(Key.W)
        w.tick(0.016)
        w.tick(0.016)  # still held
        w.inject_key_release(Key.W)
        w.tick(0.016)

        assert pressed == [Key.W]          # edge fires once
        assert down.count(Key.W) == 2      # held repeats per tick
        assert released == [Key.W]

    def test_axis_and_close(self):
        w = HeadlessWindow()
        axes, closed = [], []
        w.events.on_axis_input.append(lambda a, v: axes.append((a, v)))
        w.events.on_window_closed.append(lambda: closed.append(True))
        w.inject_axis("MouseX", 3.5)
        w.close()
        w.tick(0.016)
        assert axes == [("MouseX", 3.5)]
        assert closed == [True]

    def test_renderer_attach_resize(self):
        from vrt.render.api import new_renderer

        w = new_window(width=64, height=48)
        r = new_renderer()
        w.attach_renderer(r)
        assert (r.width, r.height) == (64, 48)
        w.resize(32, 32)
        assert (r.width, r.height) == (32, 32)


class TestDemoKeyToggles:
    def test_mode_switching(self):
        from vrt.apps.demo import DemoInstance
        from vrt.engine.engine import Engine
        from vrt.render.gpuscene import RenderMode

        inst = DemoInstance()
        engine = Engine(inst, width=8, height=8)
        inst.on_engine_initialized(engine)

        inst.window.inject_key_press(Key.K1)  # cube mode on
        inst.window.tick(0.016)
        assert engine.render_mode == RenderMode(interp=False, textured=True,
                                                lit=True)
        inst.window.inject_key_press(Key.K3)  # unlit on
        inst.window.tick(0.016)
        assert engine.render_mode == RenderMode(interp=False, textured=True,
                                                lit=False)
        inst.window.inject_key_release(Key.K1)
        inst.window.inject_key_press(Key.K1)  # cube mode off again
        inst.window.tick(0.016)
        assert engine.render_mode == RenderMode(interp=True, textured=True,
                                                lit=False)


class TestFlyCamera:
    def test_wasd_and_mouse_look(self):
        from vrt.apps.demo import DemoInstance
        from vrt.engine.engine import Engine

        inst = DemoInstance()
        engine = Engine(inst, width=8, height=8)
        inst.on_engine_initialized(engine)
        cam = engine.scene.active_camera
        x0 = cam.position[0]

        inst.window.inject_key_press(Key.W)
        inst.on_engine_update(engine, 0.1)   # held W moves along forward(-x)
        inst.window.inject_key_release(Key.W)
        assert cam.position[0] < x0

        rot0 = cam.rotation.copy()
        inst.window.inject_axis("MouseX", 50.0)
        inst.on_engine_update(engine, 0.016)
        assert not np.allclose(cam.rotation, rot0)
