"""Voxel-grid size laws and index<->position maps.

Reproduces the reference data-model laws exactly
(``VR/Voxel/Private/VoxelVolume.cpp``):

- voxels per axis  n = 2 + (2^r - 1) = 2^r + 1     (:23)
- cell size        h = 2*extends / (n - 1)         (:24)
- volume spans [-extends, +extends]^3, voxel i at  -extends + i*h
- cells per axis   c = n - 1 = 2^r; octree max depth = r
- flat CPU layout is x-major, then z, then y:
  ``Index3DTo1D(x,y,z) = x*n*n + z*n + y``  (``VR/Core/Private/MathHelpers (2).cpp``)

Default (outside) density is +30 (``VR/Voxel/Private/Voxel.cpp:94``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

DEFAULT_DENSITY = 30.0
MAX_RESOLUTION = 8  # reference voxelizer cap (VOX/Private/VolumeConverter.cpp:43-47)


@dataclasses.dataclass(frozen=True)
class GridLaw:
    """Static (python-level) geometry of a cubic voxel grid."""

    resolution: int
    extends: float

    @property
    def n_voxels(self) -> int:
        return (1 << self.resolution) + 1

    @property
    def n_cells(self) -> int:
        return 1 << self.resolution

    @property
    def cell_size(self) -> float:
        return (2.0 * self.extends) / (self.n_voxels - 1)

    @property
    def origin(self) -> float:
        """World position of voxel (0,0,0): -extends on each axis."""
        return -self.extends

    def voxel_to_position(self, idx):
        """Voxel index -> position relative to volume center.

        ``VVoxelVolume::VoxelIndexToRelativePosition`` and the shader's
        ``VoxelIndexToWorldSpace`` (``SH/Include/Voxel.hlsli:32-41``).
        """
        return jnp.asarray(idx, jnp.float32) * self.cell_size + self.origin

    def position_to_cell(self, pos):
        """Position -> containing cell index (floor), shader's
        ``WorldSpaceToVoxelSpace`` (``SH/Include/Voxel.hlsli:21-30``)."""
        rel = jnp.asarray(pos, jnp.float32) - self.origin
        return jnp.floor(rel / self.cell_size).astype(jnp.int32)

    def position_to_voxel(self, pos):
        """Position -> nearest voxel index (round),
        ``VVoxelVolume::RelativePositionToVoxelIndex``."""
        rel = jnp.asarray(pos, jnp.float32) - self.origin
        return jnp.round(rel / self.cell_size).astype(jnp.int32)


def flat_to_xyz(flat: np.ndarray, n: int) -> np.ndarray:
    """Reference 1D voxel buffer -> [n,n,n] array indexed [x,y,z].

    The reference flat order is x-major, then z, then y, so a C-order reshape
    yields [x,z,y]; transpose the last two axes.
    """
    return flat.reshape(n, n, n).transpose(0, 2, 1)


def xyz_to_flat(arr: np.ndarray) -> np.ndarray:
    """[x,y,z]-indexed array -> reference flat 1D order."""
    return np.ascontiguousarray(arr.transpose(0, 2, 1)).reshape(-1)


def quantize_density_like_reference(d):
    """Optional emulation of the DX backend's sign-magnitude fixed-point
    density encoding: 15-bit magnitude in 0.01 steps
    (``VR/Renderer/DX/Private/RDXVoxelVolume.cpp:399-421``,
    decode ``SH/Include/Voxel.hlsli:254-265``).
    """
    mag = jnp.minimum(jnp.floor(jnp.abs(d) * 100.0), 32767.0) * 0.01
    return jnp.where(d < 0, -mag, mag).astype(jnp.float32)
