"""Device-side volume + march result pytrees."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vrt.volume.accel import build_accel
from vrt.volume.volume import VoxelVolume

# Hit kinds, mirroring the distinct ReportHit sites of the intersection
# shaders (SH/Raytracing.hlsl:147-336, SH/Raytracing_Cube.hlsl).
KIND_NONE = 0        # ray left the volume without a hit

KIND_SURFACE = 1     # isosurface root inside a cell (interp modes)
KIND_SOLID_ENTRY = 2 # entry cell fully solid -> hit at volume entry face
KIND_EXHAUSTED = 3   # 255-iteration cap -> reference reports t=10, unlit red
KIND_CUBE = 4        # cube mode: entered a voxel with density <= 0
KIND_DEBUG = 5       # SHADER_DEBUG overlay: octree-node border (unlit red)


def pack_cell_corners(sdf, accel=None, dtype=None) -> np.ndarray:
    """[N,N,N] SDF -> [N-1,N-1,N-1,8|9] per-cell corner values in the
    reference corner order (VOXEL_COORDS), with the packed accel value
    appended as a 9th (exactly-representable) float channel when given —
    the march then needs ONE gather per step.  Works on numpy and traced
    arrays (stack of static slices) so fitting can re-pack in-jit.

    ``dtype`` selects the march-table precision.  bfloat16 halves the
    gather bytes (the fast-march mode; the reference's own volume texture
    quantizes densities to 15-bit fixed point, a comparable error); skip
    distances are clamped to 127 so the packed accel channel stays
    exactly representable (a smaller skip is always traversal-safe).
    """
    from vrt.march.isosurface import CORNERS

    xp = jnp if isinstance(sdf, jax.Array) else np
    dtype = dtype or sdf.dtype
    c = sdf.shape[0] - 1
    chans = [sdf[dx:dx + c, dy:dy + c, dz:dz + c].astype(dtype)
             for dx, dy, dz in CORNERS]
    if accel is not None:
        if np.dtype(dtype).itemsize < 4:
            accel = (xp.minimum(accel >> 1, 127) << 1) | (accel & 1)
        chans.append(accel.astype(dtype))
    return xp.stack(chans, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceVolume:
    """One voxel volume's device state (optionally padded to a common N).

    ``sdf``/``materials`` are [N,N,N] indexed [x,y,z]; ``accel`` is the packed
    skip-level field [N-1,N-1,N-1] (see ``vrt.volume.accel``).  ``n`` is the
    *actual* voxel count per axis (<= N) so volumes of different resolutions
    can share one batched pytree.
    """

    sdf: jax.Array        # f32 [N,N,N]
    materials: jax.Array  # i32 [N,N,N]
    accel: jax.Array      # i32 [N-1,N-1,N-1]
    n: jax.Array          # i32 [] actual voxels per axis
    cell_size: jax.Array  # f32 []
    extends: jax.Array    # f32 []
    # Corner-packed SDF: corners[c] = the 8 cell-corner values of cell c —
    # an aligned 16/32 B row so a root-finding iteration's fetch is ONE
    # contiguous gather.  8x memory; None-able for memory-tight fitting.
    # (Legacy 9-channel tables with a folded accel channel still load; the
    # fetchers slice [..., :8].)
    corners: jax.Array | None = None  # f32|bf16 [N-1,N-1,N-1,8]
    # Accel interpretation: 'octree' = aligned skip-level blocks (reference
    # traversal parity); 'chebyshev' = distance-map cubes (bigger skips,
    # identical hits).  Static: switching recompiles.
    accel_mode: str = dataclasses.field(metadata=dict(static=True),
                                        default="octree")

    # Fused-fetch cutoff, measured on the flagship 1080p frame march
    # (round 4): at 65^3 x 2 volumes (9.4 MB stacked 9-ch bf16) the fused
    # single gather beats split-phase 417 vs 503 ms — the per-step u8
    # gather plus the cond corner row (which fires on most iterations of
    # hit-heavy chunks) costs more than one 18 B row.  At 129^3 (75 MB
    # stacked) split-phase wins 556 vs 709 ms.  The cutoff sits between:
    # 12 MB per volume.  (Round 2's 5 MB VMEM-residency estimate from
    # scripts/probe_table_cliff.py undershot — the frame-level measurement
    # governs.)
    FUSE_BUDGET_BYTES = 24_000_000

    @classmethod
    def from_volume(cls, vol: VoxelVolume, pad_to: int | None = None,
                    pack_corners: bool = True,
                    accel_mode: str = "octree",
                    march_dtype=None,
                    fuse_budget_bytes: int | None = None) -> "DeviceVolume":
        """Host-side (numpy) assembly — a single device transfer per array,
        no eager device ops (the accel build runs vectorized on the host).

        ``march_dtype`` (e.g. ``jnp.bfloat16``) selects the fast-march
        corner-table precision (~+25% rays/s at 129^3 from halved gather
        bytes); traversal, root brackets, and the packed-table resolve all
        read it, with the error comparable to the reference's own 15-bit
        fixed-point volume-texture quantization
        (``RDXVoxelVolume.cpp:399-421``).  Default f32 is bit-exact."""
        n = vol.n_voxels
        pad_n = pad_to or n
        assert pad_n >= n
        # Fetch-strategy selection (see vrt.march.march): VMEM-resident
        # tables (<= FUSE_BUDGET_BYTES) pack the accel as a fused 9th
        # channel — one ~420 M rows/s gather per step.  Larger tables
        # stay 8 channels (aligned 16/32 B rows) and the march reads the
        # accel from its own flat uint8 gather every step, deferring the
        # corner row to root-finding iterations (HBM rows cost 2.5-3x
        # more when misaligned, scripts/probe_gather3/4).
        budget = (cls.FUSE_BUDGET_BYTES if fuse_budget_bytes is None
                  else fuse_budget_bytes)
        itemsize = np.dtype(march_dtype or np.float32).itemsize
        fold_accel = ((pad_n - 1) ** 3 * 9 * itemsize <= budget)
        sdf = np.asarray(vol.sdf, np.float32)
        mats = np.asarray(vol.voxel_materials, np.int32)
        if accel_mode == "chebyshev":
            from vrt.volume.accel import build_accel_chebyshev

            accel = np.asarray(build_accel_chebyshev(sdf), np.int32)
        else:
            accel = np.asarray(build_accel(sdf, vol.resolution), np.int32)
        corners = (pack_cell_corners(sdf, accel if fold_accel else None,
                                     dtype=march_dtype)
                   if pack_corners else None)
        if pad_n > n:
            p = pad_n - n
            sdf = np.pad(sdf, ((0, p),) * 3)
            mats = np.pad(mats, ((0, p),) * 3)
            accel = np.pad(accel, ((0, p),) * 3)
            if corners is not None:
                corners = np.pad(corners, ((0, p),) * 3 + ((0, 0),))
        return cls(sdf=jnp.asarray(sdf), materials=jnp.asarray(mats),
                   accel=jnp.asarray(accel),
                   n=jnp.asarray(n, jnp.int32),
                   cell_size=jnp.asarray(vol.cell_size, jnp.float32),
                   extends=jnp.asarray(vol.extends, jnp.float32),
                   corners=(None if corners is None
                            else jnp.asarray(corners)),
                   accel_mode=accel_mode)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MarchHit:
    """Per-ray march result (batched [R])."""

    hit: jax.Array          # bool
    t: jax.Array            # f32, +inf when no hit
    kind: jax.Array         # i32, KIND_*
    cell: jax.Array         # i32 [R,3] hit cell (surface/cube kinds)
    t_in: jax.Array         # f32 bracket entry used for the cubic
    t_out: jax.Array        # f32 bracket exit used for the cubic
    face_normal: jax.Array  # f32 [R,3] face normal (solid-entry / cube kinds)
    # march iterations this lane was ACTIVE for (roofline accounting:
    # active-lane gather work).  None when the producing path doesn't
    # instrument (select/tree ops must strip it first in that case).
    steps: jax.Array | None = None

    @classmethod
    def none(cls, r: int) -> "MarchHit":
        return cls(hit=jnp.zeros(r, bool),
                   t=jnp.full(r, np.inf, jnp.float32),
                   kind=jnp.zeros(r, jnp.int32),
                   cell=jnp.zeros((r, 3), jnp.int32),
                   t_in=jnp.zeros(r, jnp.float32),
                   t_out=jnp.zeros(r, jnp.float32),
                   face_normal=jnp.zeros((r, 3), jnp.float32))

    @classmethod
    def none_like(cls, o) -> "MarchHit":
        """No-hit result derived arithmetically from the ray origins so every
        field inherits their device-varying type — required for while_loop
        carries inside ``shard_map`` (vma consistency)."""
        zf = o[:, 0] * 0.0
        zi = zf.astype(jnp.int32)
        zf3 = o * 0.0
        zi3 = zf3.astype(jnp.int32)
        return cls(hit=zi != 0,
                   t=zf + np.inf,
                   kind=zi,
                   cell=zi3,
                   t_in=zf,
                   t_out=zf,
                   face_normal=zf3)

    def select(self, mask, other: "MarchHit") -> "MarchHit":
        """Lanewise: self where mask else other."""
        def sel(a, b):
            m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
            return jnp.where(m, a, b)
        return jax.tree.map(sel, self, other)
