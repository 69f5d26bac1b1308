"""Renderer facade — the ``VRenderer`` abstract interface equivalent
(``VR/Renderer/Public/Renderer.h:32-44``), plus the factory.

Provides the backend-agnostic surface the engine drives: start/stop,
set_scene, set_render_mode, resize, render.  The only backend is the
JAX/XLA device renderer (as DX12 was the reference's only backend).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vrt.render.gpuscene import RenderMode
from vrt.render.renderer import render_image
from vrt.scene.scene import Scene


class Renderer:
    def __init__(self, width: int = 512, height: int = 512,
                 mode: RenderMode = RenderMode()):
        self.width = width
        self.height = height
        self.mode = mode
        self._scene: Optional[Scene] = None
        self._gpu_scene = None
        self._active = False

    # -- VRenderer interface parity ---------------------------------------
    def start(self) -> bool:
        self._active = True
        return True

    def stop(self) -> None:
        self._active = False
        self._gpu_scene = None

    @property
    def is_active(self) -> bool:
        return self._active

    def set_scene_to_render(self, scene: Scene) -> None:
        self._scene = scene
        self._gpu_scene = None

    def set_renderer_mode(self, mode: RenderMode | int) -> None:
        self.mode = (RenderMode.from_enum(mode) if isinstance(mode, int)
                     else mode)

    def resize_render_output(self, width: int, height: int) -> None:
        self.width = width
        self.height = height

    def render(self) -> np.ndarray:
        """One frame; incremental ``SyncWithScene`` then dispatch."""
        assert self._active and self._scene is not None
        self._gpu_scene = self._scene.sync_gpu(self._gpu_scene)
        return np.asarray(render_image(self._gpu_scene, self.width,
                                       self.height, self.mode))


def new_renderer(**kw) -> Renderer:
    """``VRendererFactory::NewRenderer`` equivalent."""
    return Renderer(**kw)
