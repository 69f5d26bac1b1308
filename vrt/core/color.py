"""RGBA color constants (``VColor``, ``VR/Core/Public/Color.h``)."""

from __future__ import annotations

import numpy as np

WHITE = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
BLACK = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
RED = np.array([1.0, 0.0, 0.0, 1.0], np.float32)
GREEN = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
BLUE = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
TRANSPARENT = np.array([0.0, 0.0, 0.0, 0.0], np.float32)


def lerp(a, b, t: float):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return a + (b - a) * t
