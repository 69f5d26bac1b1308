"""Window/input abstraction — the ``VR/UI`` layer, headless.

The reference wraps Win32 windows with signal-based input events
(``VWindow``: OnWindowClosed / OnKeyDown (held) / OnKeyPressed (edge) /
OnKeyReleased / OnAxisInput, ``VR/UI/Public/Window.h:32-105``).  A native
swapchain window is a non-goal on a TPU host (SURVEY.md section 7); this
module keeps the *event contract* so app code (key-toggled render modes,
fly-camera axes) ports over:

- ``HeadlessWindow`` renders frames into arrays (optionally dumping PNGs)
  and pumps an injectable input queue — tests and scripted demos drive it
  programmatically, matching the reference's WndProc pump semantics
  (held-key OnKeyDown repeats each tick; OnKeyPressed fires on edges).
"""

from __future__ import annotations

import enum
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Set, Tuple


class Key(enum.Enum):
    W = "w"
    A = "a"
    S = "s"
    D = "d"
    Q = "q"
    E = "e"
    K1 = "1"
    K2 = "2"
    K3 = "3"
    ESCAPE = "escape"
    SPACE = "space"


class InputEvents:
    """Signal bus mirroring the VWindow boost::signals2 events."""

    def __init__(self):
        self.on_window_closed: List[Callable[[], None]] = []
        self.on_key_down: List[Callable[[Key], None]] = []      # held
        self.on_key_pressed: List[Callable[[Key], None]] = []   # edge
        self.on_key_released: List[Callable[[Key], None]] = []
        self.on_axis_input: List[Callable[[str, float], None]] = []


class HeadlessWindow:
    def __init__(self, width: int = 512, height: int = 512,
                 title: str = "vrt"):
        self.width = width
        self.height = height
        self.title = title
        self.events = InputEvents()
        self.renderer = None
        self._held: Set[Key] = set()
        self._queue: List[Tuple[str, object]] = []
        self._closed = False

    # -- renderer attachment (VWindow::SetRenderer) ------------------------
    def attach_renderer(self, renderer) -> None:
        self.renderer = renderer
        renderer.resize_render_output(self.width, self.height)

    def set_title(self, title: str) -> None:
        self.title = title

    def resize(self, width: int, height: int) -> None:
        self.width = width
        self.height = height
        if self.renderer is not None:
            self.renderer.resize_render_output(width, height)

    def close(self) -> None:
        self._closed = True

    @property
    def closed(self) -> bool:
        return self._closed

    # -- input injection (the WndProc equivalent) --------------------------
    def inject_key_press(self, key: Key) -> None:
        self._queue.append(("press", key))

    def inject_key_release(self, key: Key) -> None:
        self._queue.append(("release", key))

    def inject_axis(self, axis: str, value: float) -> None:
        self._queue.append(("axis", (axis, value)))

    # -- per-frame pump (VWindow::Tick) ------------------------------------
    def tick(self, dt: float) -> None:
        for kind, payload in self._queue:
            if kind == "press":
                if payload not in self._held:
                    for cb in self.events.on_key_pressed:
                        cb(payload)
                self._held.add(payload)
            elif kind == "release":
                self._held.discard(payload)
                for cb in self.events.on_key_released:
                    cb(payload)
            elif kind == "axis":
                axis, value = payload
                for cb in self.events.on_axis_input:
                    cb(axis, value)
        self._queue.clear()
        for key in self._held:  # held keys repeat every tick
            for cb in self.events.on_key_down:
                cb(key)
        if self._closed:
            for cb in self.events.on_window_closed:
                cb()


def new_window(**kw) -> HeadlessWindow:
    """``VWindowFactory::NewWindow`` equivalent."""
    return HeadlessWindow(**kw)
