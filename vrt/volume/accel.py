"""Traversal acceleration fields — the TPU-native collapsed octree.

The reference builds a pointer-based cell octree, merges every subtree whose
leaf cells are all surface-free (``VCellOctreeNode::TryToMergeNodes``,
``VR/Voxel/Private/Octree.cpp:70-107``), linearizes it into a 3D "traversal
texture", and walks it per-ray with up to 8 levels of pointer chasing
(``SH/Include/Voxel.hlsli:293-495``).

Pointer chasing is hostile to a vector machine.  The same information —
"the largest aligned power-of-two empty block containing this cell" — is
re-expressed here as a dense per-cell *skip level* field:

    skip_level[c] = max { L : the aligned 2^L-cell block containing c
                              is entirely surface-free }   (0 if none)

which is exactly the collapsed-octree leaf containing ``c``: the node origin
is ``(c >> L) << L`` and the node size ``cell_size * 2^L`` (matching
``GetNodeSize``, ``SH/Include/Voxel.hlsli:63-70``).  Building it is a chain
of 2x2x2 max-pools (one fused XLA reduce-window per level), and the per-step
lookup in the march is a single gather instead of <=8 dependent texture
fetches.

The field is packed together with the per-cell surface flag:

    accel[c] = (skip_level[c] << 1) | has_surface[c]

so the hot loop needs exactly one int32 gather per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def cell_corner_signs_differ(sdf):
    """Per-cell surface flag: sign differs among the 8 cell corners.

    Matches ``VCell::HasSurface`` / ``HasIsoSurfaceInsideCell``
    (``SH/Include/Voxel.hlsli:497-517``): uses three-valued sign, so an
    exactly-zero corner differs from both positive and negative corners.
    """
    xp = _xp(sdf)
    s = xp.sign(sdf)
    s000 = s[:-1, :-1, :-1]
    diff = xp.zeros(s000.shape, dtype=bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx == dy == dz == 0:
                    continue
                corner = s[dx:dx + s000.shape[0],
                           dy:dy + s000.shape[1],
                           dz:dz + s000.shape[2]]
                diff = diff | (corner != s000)
    return diff


def build_skip_level(has_surface, max_level: int):
    """Skip-level field from the per-cell surface flag.

    ``has_surface``: bool [C,C,C] with C = 2^max_level.  Returns int32
    [C,C,C] with values in [0, max_level].
    """
    xp = _xp(has_surface)
    c = has_surface.shape[0]
    occ = has_surface.astype(np.int32)
    level = xp.zeros_like(occ)
    block = occ
    for lvl in range(1, max_level + 1):
        side = c >> lvl
        if side < 1:
            break
        # 2x2x2 max-pool of the previous level's block occupancy.
        block = block.reshape(side, 2, side, 2, side, 2).max(axis=(1, 3, 5))
        free = block == 0  # [side]^3
        free_cells = xp.repeat(xp.repeat(xp.repeat(
            free, 1 << lvl, 0), 1 << lvl, 1), 1 << lvl, 2)
        level = xp.where(free_cells, lvl, level)
    return level


def build_accel(sdf, resolution: int):
    """Packed accel field for one volume: int32 [C,C,C]."""
    has_surface = cell_corner_signs_differ(sdf)
    skip = build_skip_level(has_surface, resolution)
    return (skip << 1) | has_surface.astype(np.int32)


def unpack_accel(accel):
    """-> (skip_level int32, has_surface bool)."""
    return accel >> 1, (accel & 1).astype(bool)


def build_accel_chebyshev(sdf, resolution: int = 0):
    """Alternative accel: packed ``(chebyshev_distance << 1) | has_surface``.

    ``chebyshev_distance[c]`` is the chessboard distance (in cells) to the
    nearest surface cell (0 on surface cells).  A ray in cell ``c`` can skip
    the cube of half-extent ``d-1`` centered on ``c`` — generally a larger
    jump than the aligned power-of-two block of the octree-equivalent field,
    at identical hit results (skipped cubes are surface-free by
    construction).  Host-side dependency-free build: iterated separable
    cube dilations (the L-inf ball of radius k is k chained radius-1 cube
    dilations, each 3 axis-wise window-3 maxima); distances are capped at
    127 (the bf16-packable skip budget — a smaller skip is always
    traversal-safe).  The in-jit fit path keeps the octree-equivalent field.
    """
    has_surface = np.asarray(cell_corner_signs_differ(sdf))
    return (_chebyshev_dt(has_surface) << 1) | has_surface.astype(np.int32)


def _chebyshev_dt(mask: np.ndarray, cap: int = 127) -> np.ndarray:
    """Chessboard (L-inf) distance to the nearest True cell, capped.

    All-False masks return ``cap`` everywhere.
    """
    covered = mask.astype(bool)
    dist = np.where(covered, 0, cap).astype(np.int32)

    def dilate1(m):
        for ax in range(3):
            lo = np.roll(m, 1, axis=ax)
            hi = np.roll(m, -1, axis=ax)
            # zero out the wrap-around planes
            sl_lo = [slice(None)] * 3
            sl_lo[ax] = slice(0, 1)
            sl_hi = [slice(None)] * 3
            sl_hi[ax] = slice(-1, None)
            lo[tuple(sl_lo)] = False
            hi[tuple(sl_hi)] = False
            m = m | lo | hi
        return m

    for k in range(1, cap):
        if covered.all():
            break
        grown = dilate1(covered)
        newly = grown & ~covered
        if not newly.any():
            break
        dist[newly] = k
        covered = grown
    return dist
