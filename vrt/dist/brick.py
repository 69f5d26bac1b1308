"""Slab-sharded voxel volumes with halo exchange — model parallelism.

A volume too large (or a parameter grid too hot) to replicate is split into
x-slabs over the mesh's 'model' axis.  Each shard stores:

- its owned SDF voxel planes ``[cell_lo, cell_hi]`` plus ``HALO`` = 2 extra
  planes per side — the cell-corner stencil needs +1 plane and the
  central-difference normal (``GetNormal``, ``SH/Include/Voxel.hlsli:783``)
  reads cells +-1 beyond the hit cell, so 2 voxel planes per side
  (SURVEY.md §7 "halo correctness"),
- the *globally built* skip-level accel field sliced to its owned cells, so
  in-slab traversal takes exactly the replicated march's node steps.

Marching: every shard marches every ray, but only reports hits inside its
owned cells.  Out-of-slab (in-volume) space is one giant empty node spanning
from the slab boundary outward — the ray crosses it in a single step, and
since owned slab boundaries sit on power-of-two cell planes, the re-entry
bracket coincides with the replicated march's aligned-block exits (interior
hits resolve bitwise-identically; boundary-cell hits differ only in the
sub-cell bracket start).  The closest hit across shards is an
``all_gather`` + argmin + psum select (``combine_hits``), typed
axis-invariant so it can leave the ``shard_map`` replicated.

Halos refresh with a pair of ``ppermute`` shifts (``exchange_halos``) —
differentiable, so the fitting path's halo reads route gradients back to
the owning neighbor (``vrt.dist.slab_render``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vrt.core.grid import DEFAULT_DENSITY
from vrt.march import isosurface as iso
from vrt.march.march import (EXHAUSTED_T, MAX_ITERATIONS, _inv_dir, ray_aabb)
from vrt.march.resolve import resolve_hits
from vrt.march.types import (KIND_EXHAUSTED, KIND_SOLID_ENTRY, KIND_SURFACE,
                             MarchHit)
from vrt.volume.accel import build_accel
from vrt.volume.volume import VoxelVolume

HALO = 2  # voxel planes per side: corner stencil +1, normal stencil +2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlabVolume:
    """One volume sharded into x-slabs (stacked leading S axis; inside a
    ``shard_map`` each shard peels its slice with ``tree.map(x[0])``)."""

    sdf: jax.Array        # f32 [S, span, N, N]; span = cps + 1 + 2*HALO
    accel: jax.Array      # i32 [S, cps, C, C] — global accel, owned x-cells
    x_voxel0: jax.Array   # i32 [S] global x index of local sdf plane 0
    cell_lo: jax.Array    # i32 [S] first owned x-cell (inclusive)
    cell_hi: jax.Array    # i32 [S] last owned x-cell (exclusive)
    n: jax.Array          # i32 [S] voxels per axis of the full volume
    cell_size: jax.Array  # f32 [S]
    extends: jax.Array    # f32 [S]
    # Accel interpretation ('octree' | 'chebyshev'), as in DeviceVolume.
    accel_mode: str = dataclasses.field(metadata=dict(static=True),
                                        default="octree")


def shard_volume(vol: VoxelVolume, n_shards: int,
                 accel_mode: str = "octree") -> SlabVolume:
    """Host-side slab split.  Cells per axis must divide ``n_shards``.

    The accel field is built over the FULL grid first (skip blocks/cubes are
    surface-free globally, so owned-cell skips can safely jump past slab
    boundaries), then sliced per shard.
    """
    n = vol.n_voxels
    cells = n - 1
    assert cells % n_shards == 0, (cells, n_shards)
    cps = cells // n_shards
    span = cps + 1 + 2 * HALO

    if accel_mode == "chebyshev":
        from vrt.volume.accel import build_accel_chebyshev

        accel_full = np.asarray(build_accel_chebyshev(vol.sdf), np.int32)
    else:
        accel_full = np.asarray(build_accel(vol.sdf, vol.resolution),
                                np.int32)
    sdf_full = np.asarray(vol.sdf, np.float32)

    sdf = np.full((n_shards, span, n, n), DEFAULT_DENSITY, np.float32)
    accel = np.zeros((n_shards, cps, cells, cells), np.int32)
    x0s = np.zeros(n_shards, np.int32)
    los = np.zeros(n_shards, np.int32)
    his = np.zeros(n_shards, np.int32)
    for s in range(n_shards):
        lo_cell = s * cps
        x0 = lo_cell - HALO
        x0s[s], los[s], his[s] = x0, lo_cell, lo_cell + cps
        src_lo = max(0, x0)
        src_hi = min(n, x0 + span)
        sdf[s, src_lo - x0:src_hi - x0] = sdf_full[src_lo:src_hi]
        accel[s] = accel_full[lo_cell:lo_cell + cps]

    return SlabVolume(
        sdf=jnp.asarray(sdf), accel=jnp.asarray(accel),
        x_voxel0=jnp.asarray(x0s), cell_lo=jnp.asarray(los),
        cell_hi=jnp.asarray(his),
        n=jnp.full(n_shards, n, jnp.int32),
        cell_size=jnp.full(n_shards, vol.cell_size, jnp.float32),
        extends=jnp.full(n_shards, vol.extends, jnp.float32),
        accel_mode=accel_mode)


def _slab_fetch(slab: SlabVolume):
    """Voxel fetch in GLOBAL indices against the local slab storage.
    Reads outside the volume or outside the stored planes return 0.0
    (matching the D3D out-of-bounds-SRV semantics of the full fetch)."""
    span, nn = slab.sdf.shape[0], slab.sdf.shape[-1]
    flat = slab.sdf.reshape(-1)

    def fetch(idx):
        lx = idx[..., 0] - slab.x_voxel0
        valid = (jnp.all((idx >= 0) & (idx < slab.n), axis=-1)
                 & (lx >= 0) & (lx < span))
        lxc = jnp.clip(lx, 0, span - 1)
        ic = jnp.clip(idx[..., 1:], 0, nn - 1)
        lin = (lxc * nn + ic[..., 0]) * nn + ic[..., 1]
        return jnp.where(valid, jnp.take(flat, lin, axis=0), 0.0)

    return fetch


def _slab_accel_fetch(slab: SlabVolume):
    """Packed accel value for GLOBAL cells; 0 outside the owned slab."""
    cps = slab.accel.shape[0]
    cc = slab.accel.shape[-1]
    flat = slab.accel.reshape(-1)

    def fetch(cell):
        owned = ((cell[..., 0] >= slab.cell_lo)
                 & (cell[..., 0] < slab.cell_hi)
                 & jnp.all((cell[..., 1:] >= 0) & (cell[..., 1:] < cc),
                           axis=-1))
        lx = jnp.clip(cell[..., 0] - slab.cell_lo, 0, cps - 1)
        ic = jnp.clip(cell[..., 1:], 0, cc - 1)
        lin = (lx * cc + ic[..., 0]) * cc + ic[..., 1]
        return jnp.where(owned, jnp.take(flat, lin, axis=0), 0)

    return fetch


def march_volume_slab(slab: SlabVolume, o, d, t_max, interp: bool = True,
                      debug_overlay: bool = False) -> MarchHit:
    """March rays (object space) against one shard's slab.

    A thin configuration of the production ``_march_core`` (one loop for
    replicated AND sharded marching — no fork to drift): the slab supplies

    - global-index SDF/accel fetches against local storage (out-of-slab
      reads return 0 → no surface, no hit),
    - a ``node_geometry`` hook that yields the identical aligned skip box
      for owned cells and one giant empty span for the out-of-slab region
      on each side (crossed in a single step; owned slab boundaries sit on
      power-of-two cell planes, so re-entry brackets coincide with the
      replicated march's aligned-block exits),
    - per-shard chord retirement (``lane_ok``/``t_exit_cap``): rays whose
      chord misses the owned slab box never enter the while_loop, and the
      traversal exit clamps to the slab-box exit + one cell of slack
      (covers the +0.1 node-exit/entry biases).

    Hits are reported only for owned cells; combine with ``combine_hits``.
    ``interp=False`` is the cube mode, ``debug_overlay`` as in
    ``march_volume``.
    """
    from vrt.march.march import _march_core, node_box_from_accel

    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    slab = jax.lax.stop_gradient(slab)

    # Rays are usually replicated over the 'model' axis while the slab is
    # device-varying; adding a varying zero promotes every while_loop carry
    # to the varying type shard_map's vma checker requires (value-preserving:
    # x + 0.0 is exact).
    vz = slab.cell_size * 0.0
    o = o + vz
    d = d + vz
    t_max = t_max + vz

    h = slab.cell_size
    ext = slab.extends
    n = slab.n
    fetch = _slab_fetch(slab)
    accel_fetch = _slab_accel_fetch(slab)
    lo_plane = slab.cell_lo.astype(jnp.float32) * h - ext
    hi_plane = slab.cell_hi.astype(jnp.float32) * h - ext

    def node_geometry(cell, av):
        valid, has_surf, own_lo, own_hi = node_box_from_accel(
            cell, av, slab.accel_mode, n, h, h, ext)
        owned = (cell[..., 0] >= slab.cell_lo) & (cell[..., 0] < slab.cell_hi)
        left = cell[..., 0] < slab.cell_lo
        out_lo_x = jnp.where(left, -ext, hi_plane)
        out_hi_x = jnp.where(left, lo_plane, ext)
        neg = jnp.broadcast_to(-ext, out_lo_x.shape)
        pos = jnp.broadcast_to(ext, out_hi_x.shape)
        out_lo = jnp.stack([out_lo_x, neg, neg], axis=-1)
        out_hi = jnp.stack([out_hi_x, pos, pos], axis=-1)
        m = owned[..., None]
        return valid, has_surf & owned, jnp.where(m, own_lo, out_lo), \
            jnp.where(m, own_hi, out_hi)

    # Per-shard chord retirement (see docstring).
    slab_lo = jnp.stack([lo_plane, -ext, -ext], axis=-1)
    slab_hi = jnp.stack([hi_plane, ext, ext], axis=-1)
    slab_ok, _, slab_exit = ray_aabb(o, d, slab_lo, slab_hi, t_max)

    def voxel_owned(cell):
        # cube mode: voxel x-plane ownership (the final global plane n-1
        # belongs to the last shard, whose cell_hi is the last cell row)
        x = cell[..., 0]
        return ((x >= slab.cell_lo) & (x < slab.cell_hi)) \
            | ((x == n - 1) & (slab.cell_hi == n - 1))

    corner_fetch = lambda cell: iso.gather_corners(fetch, cell)  # noqa: E731
    return _march_core(corner_fetch, fetch, accel_fetch, n, h,
                       ext, slab.accel_mode, o, d, t_max, interp,
                       debug_overlay, fused=False,
                       node_geometry=node_geometry, lane_ok=slab_ok,
                       t_exit_cap=slab_exit + h, voxel_owned=voxel_owned)


def combine_hits(hit: MarchHit, axis: str) -> MarchHit:
    """Closest-hit reduction across the mesh axis.

    Owned-cell hits are disjoint across shards, so min-t selection equals
    the replicated march's first-accepted-hit.  All fields are re-typed
    axis-invariant via the psum construction (each field is psum'd with
    exactly one shard contributing), so the result can leave a
    ``shard_map`` with a replicated out-spec.
    """
    t_key = jnp.where(hit.hit, hit.t, jnp.inf)
    all_t = jax.lax.all_gather(t_key, axis)          # [S, R]
    best = jnp.argmin(all_t, axis=0)                 # [R] same on all shards
    win = best == jax.lax.axis_index(axis)

    def pick(x):
        m = win.reshape(win.shape + (1,) * (x.ndim - 1))
        if x.dtype == jnp.bool_:
            return jax.lax.psum(jnp.where(m, x, False).astype(jnp.int32),
                                axis) > 0
        return jax.lax.psum(jnp.where(m, x, jnp.zeros_like(x)), axis)

    return jax.tree.map(pick, hit)


def exchange_halos(slab: SlabVolume, axis: str) -> SlabVolume:
    """Refresh halo planes from neighbors over the mesh axis (differentiable
    ``ppermute`` pair; the transpose routes halo-read gradients back to the
    plane's owner).  Edge shards keep their out-of-volume halo planes.

    Plane accounting (span = cps + 1 + 2*HALO, slot j = global plane
    ``x_voxel0 + j``): my left-halo slots [0, HALO) are globals
    [cell_lo - HALO, cell_lo) = the left neighbor's owned slots
    [span - 2*HALO - 1, span - HALO - 1); my right-halo slots
    [span - HALO, span) are the right neighbor's owned slots
    [HALO + 1, 2*HALO + 1).
    """
    size = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    span = slab.sdf.shape[0]
    hl = HALO

    to_right = slab.sdf[span - 2 * hl - 1:span - hl - 1]
    to_left = slab.sdf[hl + 1:2 * hl + 1]
    from_left = jax.lax.ppermute(
        to_right, axis, [(s, s + 1) for s in range(size - 1)])
    from_right = jax.lax.ppermute(
        to_left, axis, [(s + 1, s) for s in range(size - 1)])

    new = slab.sdf
    new = new.at[:hl].set(
        jnp.where(idx > 0, from_left, new[:hl]))
    new = new.at[span - hl:].set(
        jnp.where(idx < size - 1, from_right, new[span - hl:]))
    return dataclasses.replace(slab, sdf=new)


def assemble_full_sdf(slabs: SlabVolume) -> jax.Array:
    """Reconstruct the full [N,N,N] SDF from the stacked slab pytree's OWNED
    planes (shard s owns voxel planes [cell_lo, cell_hi); the last shard
    additionally provides the final plane).  jnp ops only, so it runs under
    jit and respects whatever sharding the stacked arrays carry."""
    span = slabs.sdf.shape[1]
    cps = span - 1 - 2 * HALO
    owned = slabs.sdf[:, HALO:HALO + cps]           # [S, cps, N, N]
    last = slabs.sdf[-1, HALO + cps]                # final voxel plane
    return jnp.concatenate(
        [owned.reshape(-1, *owned.shape[2:]), last[None]], axis=0)


def resync_slabs(slabs: SlabVolume, resolution: int) -> SlabVolume:
    """Epoch-boundary traversal resync (the documented brick_fit workflow):
    gather owned planes into the full grid, rebuild the skip-level accel
    over the CURRENT geometry, and re-slice SDF + accel into the slab
    layout.  Pure jnp (usable under jit); equals ``shard_volume`` on a
    volume holding the assembled SDF.
    """
    full = assemble_full_sdf(slabs)
    n = full.shape[0]
    cells = n - 1
    n_shards = slabs.sdf.shape[0]
    cps = cells // n_shards
    span = cps + 1 + 2 * HALO

    accel_full = build_accel(full, resolution)

    pad = jnp.full((HALO,) + full.shape[1:], DEFAULT_DENSITY, full.dtype)
    padded = jnp.concatenate([pad, full, pad], axis=0)
    sdf = jnp.stack([jax.lax.dynamic_slice_in_dim(padded, s * cps, span, 0)
                     for s in range(n_shards)])
    accel = jnp.stack([
        jax.lax.dynamic_slice_in_dim(accel_full, s * cps, cps, 0)
        for s in range(n_shards)])
    return dataclasses.replace(slabs, sdf=sdf, accel=accel)


def resolve_slab_hits(slab: SlabVolume, o, d, hit: MarchHit):
    """Differentiable (t, normal, unlit) for hits against this shard's data
    (meaningful on owned-cell hits; the 2-voxel halo covers the normal
    stencil of boundary cells).  Gradients flow into ``slab.sdf``."""
    return resolve_hits(_slab_fetch(slab), slab.cell_size, slab.extends,
                        o, d, hit)
