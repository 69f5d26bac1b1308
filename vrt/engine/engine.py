"""Engine loop — the headless ``VEngine`` equivalent.

The reference engine (``VR/Engine/Private/Engine.cpp:40-60, 201-262``) runs a
blocking loop: tick the app instance, tick all registered objects, render,
post-render, measure dt and a 1-second-window FPS counter.  The TPU engine
keeps that lifecycle (so demo/app code ports over) but renders headlessly
into device arrays; windowing/swapchain are non-goals (SURVEY.md section 7).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from vrt.render.gpuscene import RenderMode
from vrt.render.renderer import render_image
from vrt.scene.scene import Scene


class EngineInstance:
    """App callback interface (``IEngineInstance``)."""

    def on_engine_initialized(self, engine: "Engine") -> None:
        pass

    def on_engine_update(self, engine: "Engine", dt: float) -> None:
        pass

    def on_engine_shutdown(self, engine: "Engine") -> None:
        pass


class Engine:
    def __init__(self, instance: EngineInstance,
                 width: int = 512, height: int = 512,
                 mode: RenderMode = RenderMode(),
                 chunk_size: int | str | None = "auto",
                 sort_rays: bool = True,
                 pipelined: bool = True,
                 render_scale: float = 1.0):
        self.instance = instance
        self.scene: Optional[Scene] = None
        self.width = width
        self.height = height
        self.render_mode = mode
        # pipelined=True overlaps frame N's device->host readback with
        # frame N+1's dispatch (JAX dispatch is async; only np.asarray
        # blocks): last_frame lags one frame behind the scene state, like
        # a depth-2 swapchain.  False restores synchronous readback.
        self.pipelined = pipelined
        self._pending = None
        # motion-resolution mode: render at width*scale x height*scale and
        # bilinear-upsample ON DEVICE to the output size before readback.
        # Opt-in quality trade for interactive motion (the 512^2 full-lit
        # frame floors at ~125 ms on one v5e; scale 0.71 halves the ray
        # count).  1.0 = native.
        self.render_scale = float(render_scale)
        self._rw = max(16, int(round(width * self.render_scale)))
        self._rh = max(16, int(round(height * self.render_scale)))
        # "auto": sorted chunks sized for >=8 chunks per frame — enables
        # the renderer's dead-chunk skipping for sky regions (big frames
        # only; tiny frames render as one batch)
        if chunk_size == "auto":
            # 8192 measured fastest at frame scale (scripts/probe_frame_sweep)
            chunk_size = (max(2048, min(8192, (self._rw * self._rh) // 8))
                          if self._rw * self._rh > 16384 else None)
        self.chunk_size = chunk_size
        self.sort_rays = sort_rays
        self.fps = 0.0
        self.frame_count = 0
        self.last_frame: Optional[np.ndarray] = None
        self._running = False
        self._gpu_scene = None
        self._needs_sync = True

    def set_scene(self, scene: Scene) -> None:
        self.scene = scene
        self._needs_sync = True

    def set_render_mode(self, mode: RenderMode) -> None:
        self.render_mode = mode

    def start(self, max_frames: Optional[int] = None,
              frame_callback: Optional[Callable] = None) -> None:
        """Blocking engine loop (``VEngine::StartEngineLoop``)."""
        self._running = True
        self.instance.on_engine_initialized(self)

        last = time.perf_counter()
        fps_window_start = last
        fps_frames = 0

        while self._running:
            now = time.perf_counter()
            dt = now - last
            last = now

            self.instance.on_engine_update(self, dt)
            if self.scene is not None:
                self.scene.tick(dt)
                self.render_frame()
                self.scene.post_render()

            self.frame_count += 1
            fps_frames += 1
            if now - fps_window_start >= 1.0:  # 1 s FPS window (Engine.cpp:250-262)
                self.fps = fps_frames / (now - fps_window_start)
                fps_window_start = now
                fps_frames = 0

            if frame_callback is not None:
                frame_callback(self)
            if max_frames is not None and self.frame_count >= max_frames:
                break

        if self._pending is not None:  # drain the pipelined readback
            self.last_frame = np.asarray(self._pending)
            self._pending = None
        self.instance.on_engine_shutdown(self)
        self._running = False

    def stop(self) -> None:
        self._running = False

    def render_frame(self) -> np.ndarray:
        """One frame: incremental device sync (volumes re-upload only when
        dirty; per-frame constants replaced in place), render, readback."""
        if self._needs_sync:
            self._gpu_scene = None
            self._needs_sync = False
        self._gpu_scene = self.scene.sync_gpu(self._gpu_scene)
        # compact follows chunking (the wide-chunk compacted primary march,
        # vrt.march.march_lanes_compact).  Volume buffers are NOT donated:
        # sync_gpu reuses them across frames unless a volume is dirty, so
        # donation would hand XLA buffers the next frame still reads.
        img = render_image(self._gpu_scene, self._rw, self._rh,
                           self.render_mode, chunk_size=self.chunk_size,
                           sort_rays=self.sort_rays,
                           compact=(self.chunk_size is not None
                                    and self._rw * self._rh >= 262144))
        if (self._rw, self._rh) != (self.width, self.height):
            import jax

            img = jax.image.resize(img, (self.height, self.width, 4),
                                   "bilinear")
        # UNORM conversion ON DEVICE before readback (the reference's
        # R8G8B8A8_UNORM backbuffer, and 4x fewer bytes over the host
        # link — readback measured 0.4 s/frame at 720p for f32).
        img8 = (img * 255.0 + 0.5).astype("uint8")
        if self.pipelined:
            # block on LAST frame's readback while this frame's dispatch
            # runs asynchronously on device
            prev, self._pending = self._pending, img8
            if prev is not None:
                self.last_frame = np.asarray(prev)
        else:
            self.last_frame = np.asarray(img8)
        return self.last_frame
