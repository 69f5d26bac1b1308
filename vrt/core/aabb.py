"""Axis-aligned bounding box (``VAABB``, ``VR/Core/Public/AABB.h:24-49``).

Center + extends representation with ``combine`` and the
position/scale/rotation ``transform`` used for scene-object bounds
(``VVoxelObject::GetBounds``).  numpy/jnp dual-dispatch like the rest of
``vrt.core``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vrt.core import quat as vq


def _xp(*arrays):
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


@dataclasses.dataclass
class AABB:
    center: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    extends: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))

    @property
    def min(self):
        return self.center - self.extends

    @property
    def max(self):
        return self.center + self.extends

    @classmethod
    def from_min_max(cls, lo, hi) -> "AABB":
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        return cls(center=(lo + hi) * 0.5, extends=(hi - lo) * 0.5)

    def combine(self, other: "AABB") -> "AABB":
        """Union of two boxes (``VAABB::Combine``)."""
        lo = np.minimum(self.min, other.min)
        hi = np.maximum(self.max, other.max)
        return AABB.from_min_max(lo, hi)

    def transform(self, position, scale, rotation) -> "AABB":
        """Bounds of the box under the instance transform
        world = diag(scale) * R(v) + position (``VAABB::Transform``)."""
        xp = _xp(position, scale, rotation)
        corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)], np.float32)
        pts = self.center + corners * self.extends
        world = vq.rotate(xp.asarray(rotation, dtype=np.float32),
                          xp.asarray(pts, dtype=np.float32)) \
            * xp.asarray(scale, dtype=np.float32) \
            + xp.asarray(position, dtype=np.float32)
        return AABB.from_min_max(np.asarray(world).min(0),
                                 np.asarray(world).max(0))

    def contains(self, point) -> bool:
        p = np.asarray(point)
        return bool(np.all(p >= self.min) and np.all(p <= self.max))
