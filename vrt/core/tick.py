"""Global tick manager + tickable object protocol.

Mirrors ``VGlobalTickManager`` (``VR/Core/Public/TickManager.h:22-41``):
a process-wide registry of tickables; the engine loop calls
``tick_all(dt)`` each frame and ``post_render_all()`` after rendering.
Objects opt in via ``can_ever_tick`` / ``should_tick`` like ``VObject``
(``VR/Core/Public/Object.h:70-75``).
"""

from __future__ import annotations

from typing import List, Protocol, runtime_checkable


@runtime_checkable
class Tickable(Protocol):
    def tick(self, dt: float) -> None: ...


class TickManager:
    _instance: "TickManager | None" = None

    def __init__(self):
        self._objects: List[object] = []

    @classmethod
    def instance(cls) -> "TickManager":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def register(self, obj) -> None:
        if getattr(obj, "can_ever_tick", True) and obj not in self._objects:
            self._objects.append(obj)

    def unregister(self, obj) -> None:
        if obj in self._objects:
            self._objects.remove(obj)

    def tick_all(self, dt: float) -> None:
        for obj in list(self._objects):
            if getattr(obj, "should_tick", True):
                tick = getattr(obj, "tick", None)
                if tick is not None:
                    tick(dt)

    def post_render_all(self) -> None:
        for obj in list(self._objects):
            post = getattr(obj, "post_render", None)
            if post is not None:
                post()

    def clear(self) -> None:
        self._objects.clear()
