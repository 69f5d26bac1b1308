"""Analytic signed-distance generators (the ``VDensityGenerator`` family).

Shape formulas match ``VR/Scene/Private/DensityGenerator.cpp:27-42`` and CSG
combination ``ADD = min(d, child)``, ``SUBTRACT = max(d, -child)``
(``:45-83``).  Shapes carry a position/rotation transform applied at
evaluation time (``:18-25``); evaluation is vectorized over ``[..., 3]``
point arrays so an entire voxel grid bakes in one fused XLA computation
(the TPU replacement for the reference's per-voxel OpenMP bake loop,
``VR/App/Private/RendererEngineInstance.cpp:266-316``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vrt.core import quat as vq


def _xp(*arrays):
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


@dataclasses.dataclass
class Shape:
    """Base SDF shape with rigid transform (position + rotation)."""

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: vq.IDENTITY.copy())

    def evaluate(self, p):
        """Signed distance at world points ``p [..., 3]``."""
        xp = _xp(p)
        rot = xp.asarray(self.rotation)
        local = vq.rotate(vq.inverse(rot),
                          xp.asarray(p, dtype=np.float32)
                          - xp.asarray(self.position, dtype=np.float32))
        return self._evaluate_local(local)

    def _evaluate_local(self, p):
        raise NotImplementedError


@dataclasses.dataclass
class Sphere(Shape):
    radius: float = 1.0

    def _evaluate_local(self, p):
        return _xp(p).linalg.norm(p, axis=-1) - self.radius


@dataclasses.dataclass
class Box(Shape):
    extends: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    def _evaluate_local(self, p):
        xp = _xp(p)
        q = xp.abs(p) - xp.asarray(self.extends, dtype=np.float32)
        outside = xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
        inside = xp.minimum(xp.max(q, axis=-1), 0.0)
        return outside + inside


@dataclasses.dataclass
class Cylinder(Shape):
    """Capped cylinder; axis along local Y with the reference's (x,z) radial
    plane convention (``DensityGenerator.cpp:38-42``)."""

    radius: float = 1.0
    height: float = 1.0

    def _evaluate_local(self, p):
        xp = _xp(p)
        radial = xp.linalg.norm(p[..., [0, 2]] if xp is np
                                else p[..., jnp.array([0, 2])], axis=-1)
        d = xp.abs(xp.stack([radial, p[..., 1]], axis=-1)) - xp.asarray(
            [self.radius, self.height], dtype=np.float32)
        inside = xp.minimum(xp.maximum(d[..., 0], d[..., 1]), 0.0)
        outside = xp.linalg.norm(xp.maximum(d, 0.0), axis=-1)
        return inside + outside


ADD = 0
SUBTRACT = 1


@dataclasses.dataclass
class CSG:
    """CSG tree node mirroring ``VDensityShapeContainer``.

    ``d = shape(p)``; children evaluated in the shape's local frame and
    folded left-to-right with min (ADD) / max(d, -child) (SUBTRACT).
    """

    shape: Optional[Shape] = None
    combination: int = ADD
    children: List["CSG"] = dataclasses.field(default_factory=list)

    def add_child(self, shape_or_csg, combination: int = ADD) -> "CSG":
        node = (shape_or_csg if isinstance(shape_or_csg, CSG)
                else CSG(shape=shape_or_csg, combination=combination))
        node.combination = combination
        self.children.append(node)
        return node

    def evaluate(self, p):
        xp = _xp(p)
        p = xp.asarray(p, dtype=np.float32)
        if self.shape is not None:
            d = self.shape.evaluate(p)
            local = vq.rotate(vq.inverse(xp.asarray(self.shape.rotation)),
                              p - xp.asarray(self.shape.position,
                                             dtype=np.float32))
        elif self.children:
            d = self.children[0].evaluate(p)
            local = p
        else:
            return xp.zeros(p.shape[:-1], dtype=np.float32)
        for child in self.children:
            cd = child.evaluate(local)
            if child.combination == ADD:
                d = xp.minimum(d, cd)
            else:
                d = xp.maximum(d, -cd)
        return d


def bake(csg_or_shape, law, clamp: Optional[float] = None):
    """Bake an analytic SDF into an ``[n,n,n]`` float32 numpy grid.

    Evaluates the generator at every voxel position of ``law``
    (``GridLaw``) exactly as the reference demo does per voxel
    (``RendererEngineInstance.cpp:266-316``), vectorized on the host.
    Returns (sdf, material) where material is 1 inside (density <= 0)
    else 0.
    """
    n = law.n_voxels
    idx = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                               indexing="ij"), axis=-1)
    pos = np.asarray(idx, np.float32) * law.cell_size + law.origin
    d = np.asarray(csg_or_shape.evaluate(pos), np.float32)
    if clamp is not None:
        d = np.clip(d, -clamp, clamp)
    material = (d <= 0.0).astype(np.uint8)
    return d, material
