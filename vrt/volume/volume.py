"""Host-side voxel SDF volume — the ``VVoxelVolume`` equivalent.

Data model (``VR/Voxel/Private/VoxelVolume.cpp``): a dense cubic grid of
``(density, material)`` voxels where density is a signed distance
(negative = inside), sized by the law n = 2^resolution + 1 with the volume
spanning [-extends, +extends]^3.  Host storage is numpy [n,n,n] float32 /
uint8 indexed [x,y,z]; device upload produces the padded arrays consumed by
the march (see ``vrt.render.gpuscene``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from vrt.core.grid import DEFAULT_DENSITY, GridLaw
from vrt.core.material import Material


class VoxelVolume:
    def __init__(self, resolution: int, extends: float,
                 material: Optional[Material] = None,
                 sdf: Optional[np.ndarray] = None,
                 voxel_materials: Optional[np.ndarray] = None):
        self.law = GridLaw(resolution, float(extends))
        n = self.law.n_voxels
        if sdf is None:
            sdf = np.full((n, n, n), DEFAULT_DENSITY, np.float32)
        if voxel_materials is None:
            voxel_materials = np.zeros((n, n, n), np.uint8)
        assert sdf.shape == (n, n, n), (sdf.shape, n)
        self.sdf = np.asarray(sdf, np.float32)
        self.voxel_materials = np.asarray(voxel_materials, np.uint8)
        self.material = material or Material()
        self._dirty = True

    # -- data-model parity helpers -------------------------------------------
    @property
    def resolution(self) -> int:
        return self.law.resolution

    @property
    def extends(self) -> float:
        return self.law.extends

    @property
    def n_voxels(self) -> int:
        return self.law.n_voxels

    @property
    def cell_size(self) -> float:
        return self.law.cell_size

    def set_voxel(self, idx, density: float, material: int = 0) -> None:
        x, y, z = idx
        n = self.n_voxels
        if 0 <= x < n and 0 <= y < n and 0 <= z < n:
            self.sdf[x, y, z] = density
            self.voxel_materials[x, y, z] = material
            self._dirty = True

    def get_voxel(self, idx):
        x, y, z = idx
        n = self.n_voxels
        if 0 <= x < n and 0 <= y < n and 0 <= z < n:
            return float(self.sdf[x, y, z]), int(self.voxel_materials[x, y, z])
        return DEFAULT_DENSITY, 0  # out-of-range reads return a default voxel

    def fill(self, density: float, material: int = 0) -> None:
        self.sdf[:] = density
        self.voxel_materials[:] = material
        self._dirty = True

    def make_dirty(self) -> None:
        self._dirty = True

    @property
    def dirty(self) -> bool:
        return self._dirty

    def clear_dirty(self) -> None:
        self._dirty = False

    @classmethod
    def from_generator(cls, generator, resolution: int, extends: float,
                      material: Optional[Material] = None) -> "VoxelVolume":
        """Bake an analytic SDF generator (``vrt.volume.sdf``) into a volume."""
        from vrt.volume import sdf as _sdf

        law = GridLaw(resolution, float(extends))
        d, m = _sdf.bake(generator, law)
        return cls(resolution, extends, material=material,
                   sdf=np.asarray(d), voxel_materials=np.asarray(m))
