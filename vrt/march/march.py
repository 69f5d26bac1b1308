"""Batched DDA ray march through voxel SDF volumes.

TPU re-design of the DXR intersection shaders ``VRIntersection`` /
``VRIntersectionShadowRay`` (``SH/Raytracing.hlsl:147-442``) and the cube
variant (``SH/Raytracing_Cube.hlsl``): one masked ``lax.while_loop`` carries
*all* lanes of a dispatch simultaneously; every step costs one fused
contiguous gather (8 cell corners + the packed accel value), and empty
space is skipped with the collapsed-octree-equivalent skip-level field
(``vrt.volume.accel``) — or the opt-in Chebyshev distance-map — instead of
the reference's 8-level pointer walk.

The core (``_march_core``) is parameterized over per-lane volume data, so
the same loop serves:

- ``march_volume``: one volume, lanes = rays,
- the fused scene march (``vrt.render.renderer.march_scene``): lanes =
  rays x instances in a single while_loop — DXR tests every TLAS candidate
  concurrently; marching 20 instances as 20 sequential loops would
  serialize what the hardware overlaps.

Semantics reproduced exactly, including the reference's numeric quirks:

- slab tests with the ``(d>0) ? INF : -INF`` zero-direction handling
  (``SH/Include/Ray.hlsli:111-133``),
- +0.01 bias on the volume-entry t, +0.1 bias on every node-exit t
  (``SH/Raytracing.hlsl:178,195``, ``SH/Include/Voxel.hlsli:123``),
- the origin-inside-volume branch inherits ``ReverseRay``'s no-op bug:
  the first bracket start is the *negated forward* node exit + 0.01
  (``SH/Raytracing.hlsl:186-196``, ``SH/Include/Ray.hlsli:50-58``),
- a fully solid entry cell reports a hit at the (biased) entry t with a
  box-face normal; DXR rejects it when t < 0, and the shader returns either
  way (``SH/Raytracing.hlsl:198-226``),
- 255-step cap: exhausted rays report an unlit red hit at t = 10
  (``SH/Raytracing.hlsl:325-334``),
- hits are accepted iff t in [0, t_max] (DXR ReportHit TMin/TCurrent rules),
  but any reported hit terminates the volume's traversal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vrt.march import isosurface as iso
from vrt.march.types import (DeviceVolume, MarchHit, KIND_CUBE, KIND_DEBUG,
                             KIND_EXHAUSTED, KIND_SOLID_ENTRY, KIND_SURFACE)

LINE_THICKNESS = 0.5  # SHADER_DEBUG overlay border (Constants.hlsli)
MAX_ITERATIONS = 255  # SH/Raytracing.hlsl:229
EXHAUSTED_T = 10.0    # SH/Raytracing.hlsl:331

_FACE_EYE = np.eye(3, dtype=np.float32)


def _inv_dir(d):
    """Reference reciprocal-direction: 1/d, or -inf where d == 0
    (the HLSL vector ternary selects ``(d > 0) ? INF : -INF`` and d==0
    fails the > test)."""
    return jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), -jnp.inf)


def ray_aabb(o, d, lo, hi, t_max):
    """Slab test (``DetermineRayAABBIntersection``). Returns
    (intersects, t_enter, t_exit)."""
    inv = _inv_dir(d)
    sel_min = jnp.where(d > 0.0, lo, hi)
    sel_max = jnp.where(d > 0.0, hi, lo)
    tmin3 = (sel_min - o) * inv
    tmax3 = (sel_max - o) * inv
    t_enter = jnp.max(tmin3, axis=-1)
    t_exit = jnp.min(tmax3, axis=-1)
    ok = (t_exit > t_enter) & (t_exit >= 0.0) & (t_enter <= t_max)
    return ok, t_enter, t_exit


def _exit_with_axis(o, d, node_lo, node_hi):
    """Node-exit t and the exit axis with the reference's nested-if
    tie-breaking (``GoToNextVoxel``, ``SH/Include/Voxel.hlsli:80-183``).

    Node bounds are general boxes [node_lo, node_hi] so the same loop
    serves cubic skip nodes and the slab march's out-of-slab spans.
    Returns (exit_t, axis i32 in {0,1,2}).
    """
    inv = _inv_dir(d)
    sel = jnp.where(d > 0.0, node_hi, node_lo)
    tm = jnp.where(d != 0.0, (sel - o) * inv, 1e5)
    tx, ty, tz = tm[..., 0], tm[..., 1], tm[..., 2]
    # if (x < y) { x < z ? x : z } else { y < z ? y : z }
    first = tx < ty
    t_a = jnp.where(tx < tz, tx, tz)
    ax_a = jnp.where(tx < tz, 0, 2)
    t_b = jnp.where(ty < tz, ty, tz)
    ax_b = jnp.where(ty < tz, 1, 2)
    return jnp.where(first, t_a, t_b), jnp.where(first, ax_a, ax_b)


def _accel_u8(accel):
    """Packed accel field as flat uint8 for the traversal's per-step gather.

    Narrow flat gathers run ~2x faster than the wide corner rows on v5e
    (scripts/probe_table_cliff.py: u8[128^3] 121 M rows/s vs 18 B rows at
    67 M), and a 129^3 u8 field (2 MB) stays VMEM-resident.  Skip distances
    clamp to 127 so the packed value fits 8 bits — a smaller skip is always
    traversal-safe.  XLA hoists the conversion out of the march loop."""
    av = accel.reshape(-1).astype(jnp.int32)
    return ((jnp.minimum(av >> 1, 127) << 1) | (av & 1)).astype(jnp.uint8)


def _gather_accel(accel, n_cells, cell):
    """Packed accel gather; out-of-range cells read 0."""
    valid = jnp.all((cell >= 0) & (cell < n_cells), axis=-1)
    c = accel.shape[0]
    ic = jnp.clip(cell, 0, c - 1)
    flat = ic[..., 0] * (c * c) + ic[..., 1] * c + ic[..., 2]
    vals = jnp.take(_accel_u8(accel), flat, axis=0).astype(jnp.int32)
    return jnp.where(valid, vals, 0)


def _hits_node_bounds(pos, node_lo, node_hi, thickness=LINE_THICKNESS):
    """``DoesRayHitOctreeBounds`` (SH/Include/Debugging.hlsli:16-38)."""
    outer_min = node_lo - thickness
    outer_max = node_hi + thickness
    inside = jnp.all((pos >= outer_min) & (pos <= outer_max), axis=-1)
    b = (jnp.abs(pos - node_lo) <= thickness) \
        | (jnp.abs(pos - node_hi) <= thickness)
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    border = ((bx | by) & bz) | ((by | bz) & bx)
    return inside & border


def node_box_from_accel(cell, av, accel_mode, n_v, h_l, h_v, ext_v):
    """Aligned skip-node box for ``cell`` from its packed accel value.

    The collapsed-octree equivalent (``GetOctreeNode``,
    ``SH/Include/Voxel.hlsli:293-495``): octree mode decodes a level
    (power-of-two aligned block), chebyshev mode a centered
    empty-ball radius.  Returns (valid, has_surface, node_lo, node_hi);
    invalid cells get the degenerate box (lo (-1,-1,-1), size 0) like
    ``GetOctreeNode``'s fall-through.
    """
    valid = jnp.all((cell >= 0) & (cell + 1 < n_v), axis=-1)
    has_surface = (av & 1) == 1
    if accel_mode == "chebyshev":
        dd = av >> 1
        half = jnp.maximum(dd - 1, 0)
        origin_idx = cell - half[..., None]
        node_size = (2.0 * half.astype(jnp.float32) + 1.0) * h_l
    else:
        level = av >> 1
        origin_idx = (cell >> level[..., None]) << level[..., None]
        node_size = jnp.exp2(level.astype(jnp.float32)) * h_l
    node_lo = origin_idx.astype(jnp.float32) * h_v - ext_v
    node_lo = jnp.where(valid[..., None], node_lo, -1.0)
    node_hi = node_lo + jnp.where(valid, node_size, 0.0)[..., None]
    return valid, has_surface, node_lo, node_hi


def _entry_face_normal(o, d, t_enter, ext_v):
    """Box-face normal at entry (``SH/Raytracing.hlsl:198-220``): evaluated
    at pos(t_enter - 0.1); +1 on axes beyond +ext, -1 beyond -ext, else 0;
    then HLSL-normalized (zero vector -> NaN, as in the reference)."""
    rp = o + d * (t_enter - 0.1)[..., None]
    np_ = jnp.sign(rp - ext_v)
    np_ = jnp.where(np_ < 0.0, jnp.where(rp < -ext_v, -1.0, 0.0), np_)
    return np_ / jnp.linalg.norm(np_, axis=-1, keepdims=True)


def _march_begin(corner_fetch, accel_fetch, n_l, h_l, ext_l,
                 accel_mode: str, o, d, t_max, interp: bool,
                 fused: bool = False, node_geometry=None, lane_ok=None,
                 t_exit_cap=None):
    """Pre-loop march state: slab entry, entry cell, biases, the
    solid-entry check, and the cube-mode face seed.  Returns the loop
    carry ``(cell, cell_exit, active, face, res, n_steps, t_exit)`` —
    everything per-lane, so a compaction driver may permute it between
    bounded stepping rounds (``march_lanes_compact``)."""
    n_v = n_l if jnp.ndim(n_l) == 0 else n_l[..., None]
    h_v = h_l if jnp.ndim(h_l) == 0 else h_l[..., None]
    ext_v = ext_l if jnp.ndim(ext_l) == 0 else ext_l[..., None]

    def pos_to_cell(p):
        return jnp.floor((p + ext_v) / h_v).astype(jnp.int32)

    if node_geometry is None:
        def node_geometry(cell, av):
            return node_box_from_accel(cell, av, accel_mode, n_v, h_l, h_v,
                                       ext_v)

    ok, t_enter, t_exit = ray_aabb(o, d, -ext_v, ext_v, t_max)
    if lane_ok is not None:
        ok = ok & lane_ok
    if t_exit_cap is not None:
        t_exit = jnp.minimum(t_exit, t_exit_cap)

    pos_branch = t_enter >= 0.0
    t_enter_b = jnp.where(pos_branch, t_enter + 0.01, t_enter)
    entry_pos = o + d * t_enter_b[..., None]
    cell0 = jnp.where(pos_branch[..., None], pos_to_cell(entry_pos),
                      pos_to_cell(o))
    av0 = accel_fetch(cell0)
    valid0, _, node_lo0, node_hi0 = node_geometry(cell0, av0)
    # Origin-inside branch: ReverseRay is a no-op (returns the forward ray),
    # so the "backward" exit is the forward node exit, then negated + 0.01.
    fwd_exit, _ = _exit_with_axis(o, d, node_lo0, node_hi0)
    cell_exit0 = jnp.where(pos_branch, t_enter_b, -fwd_exit + 0.01)

    result = MarchHit.none_like(o)
    active = ok

    entry_norm = _entry_face_normal(o, d, t_enter_b, ext_v)

    if interp:
        corners0 = corner_fetch(cell0)
        if fused:
            corners0 = corners0[0]
        solid0 = jnp.all(corners0 < 0.0, axis=-1)
        rep = active & valid0 & solid0
        acc = rep & (t_enter_b >= 0.0) & (t_enter_b <= t_max)
        result = MarchHit(
            hit=jnp.where(acc, True, result.hit),
            t=jnp.where(acc, t_enter_b, result.t),
            kind=jnp.where(acc, KIND_SOLID_ENTRY, result.kind),
            cell=jnp.where(acc[..., None], cell0, result.cell),
            t_in=result.t_in, t_out=result.t_out,
            face_normal=jnp.where(acc[..., None], entry_norm,
                                  result.face_normal))
        active = active & ~rep
        cur_face = result.face_normal  # unused in interp mode
    else:
        # Cube mode tracks the face normal of the last crossing, seeded with
        # the volume-entry face normal (SH/Raytracing_Cube.hlsl:195-222).
        cur_face = _entry_face_normal(
            o, d, jnp.where(pos_branch, t_enter_b, t_enter), ext_v)

    steps0 = jnp.zeros_like(cell0[..., 0])
    return (cell0, cell_exit0, active, cur_face, result, steps0, t_exit)


def _march_run(carry, corner_fetch, voxel_fetch, accel_fetch, n_l, h_l,
               ext_l, accel_mode: str, o, d, t_max, interp: bool,
               debug_overlay: bool, fused: bool = False,
               node_geometry=None, voxel_owned=None,
               max_steps: int = MAX_ITERATIONS):
    """Run the march loop for up to ``max_steps`` iterations from a
    ``_march_begin``-shaped carry; returns the updated carry.  Lane
    activity is monotone-decreasing, so an always-active lane's total
    iteration count across chained runs is the sum of their budgets —
    chaining runs whose budgets sum to ``MAX_ITERATIONS`` is bit-identical
    to one full run."""
    n_v = n_l if jnp.ndim(n_l) == 0 else n_l[..., None]
    h_v = h_l if jnp.ndim(h_l) == 0 else h_l[..., None]
    ext_v = ext_l if jnp.ndim(ext_l) == 0 else ext_l[..., None]

    def pos_to_cell(p):
        return jnp.floor((p + ext_v) / h_v).astype(jnp.int32)

    def is_valid_cell(cell):
        return jnp.all((cell >= 0) & (cell + 1 < n_v), axis=-1)

    def is_valid_voxel(cell):
        return jnp.all((cell >= 0) & (cell < n_v), axis=-1)

    if node_geometry is None:
        def node_geometry(cell, av):
            return node_box_from_accel(cell, av, accel_mode, n_v, h_l, h_v,
                                       ext_v)

    (cell0, cell_exit0, active0, face0, res0, steps0, t_exit) = carry

    def cond(state):
        it, _, _, act, _, _, _ = state
        return jnp.any(act) & (it < max_steps)

    def body(state):
        it, cell, cell_exit, act, face, res, n_steps = state
        n_steps = n_steps + act.astype(jnp.int32)

        past_exit = cell_exit > t_exit
        act2 = act & ~past_exit

        cell_enter = cell_exit

        valid = is_valid_cell(cell) if interp else is_valid_voxel(cell)
        if interp and fused:
            v8, av = corner_fetch(cell)
        else:
            av = accel_fetch(cell)
        _, has_surf, node_lo, node_hi = node_geometry(cell, av)

        if debug_overlay:
            # SHADER_DEBUG: unlit red hit on octree-node borders
            dbg = act2 & valid & _hits_node_bounds(
                o + d * cell_enter[..., None], node_lo, node_hi)
            dacc = dbg & (cell_enter >= 0.0) & (cell_enter <= t_max)
            res = MarchHit(
                hit=jnp.where(dacc, True, res.hit),
                t=jnp.where(dacc, cell_enter, res.t),
                kind=jnp.where(dacc, KIND_DEBUG, res.kind),
                cell=res.cell, t_in=res.t_in, t_out=res.t_out,
                face_normal=res.face_normal)
            act2 = act2 & ~dbg

        exit_t, exit_ax = _exit_with_axis(o, d, node_lo, node_hi)
        new_exit = exit_t + 0.1
        next_cell = pos_to_cell(o + d * new_exit[..., None])

        if interp:
            cand = act2 & valid & has_surf
            # surface nodes are single cells: their box is cubic, so the
            # x-extent is the cell-space normalization (== h there)
            node_size = node_hi[..., 0] - node_lo[..., 0]

            def root_from(v8):
                p_in = o + d * cell_enter[..., None]
                p_out = o + d * new_exit[..., None]
                cell_base = cell.astype(jnp.float32) * h_v - ext_v
                a1 = (p_in - cell_base) / node_size[..., None]
                b1 = (p_out - cell_base) / node_size[..., None] - a1
                A, B, C, D = iso.cubic_coefficients(v8, a1, b1)
                return iso.surface_intersection(A, B, C, D, cell_enter,
                                                new_exit)

            if fused:
                root_hit, t_hit = root_from(v8)
            else:
                def no_root(_):
                    z = jnp.zeros_like(cell_enter)
                    return z != 0.0, z

                root_hit, t_hit = jax.lax.cond(
                    jnp.any(cand), lambda _: root_from(corner_fetch(cell)),
                    no_root, None)
            rep = cand & root_hit
            acc = rep & (t_hit >= 0.0) & (t_hit <= t_max)
            res = MarchHit(
                hit=jnp.where(acc, True, res.hit),
                t=jnp.where(acc, t_hit, res.t),
                kind=jnp.where(acc, KIND_SURFACE, res.kind),
                cell=jnp.where(acc[..., None], cell, res.cell),
                t_in=jnp.where(acc, cell_enter, res.t_in),
                t_out=jnp.where(acc, new_exit, res.t_out),
                face_normal=res.face_normal)
            stopped = rep
        else:
            dens = voxel_fetch(cell)
            rep = act2 & valid & (dens <= 0.0)
            if voxel_owned is not None:
                rep = rep & voxel_owned(cell)
            acc = rep & (cell_enter >= 0.0) & (cell_enter <= t_max)
            res = MarchHit(
                hit=jnp.where(acc, True, res.hit),
                t=jnp.where(acc, cell_enter, res.t),
                kind=jnp.where(acc, KIND_CUBE, res.kind),
                cell=jnp.where(acc[..., None], cell, res.cell),
                t_in=res.t_in, t_out=res.t_out,
                face_normal=jnp.where(acc[..., None], face, res.face_normal))
            stopped = rep
            # face normal of the crossing we are about to take
            step_norm = -jnp.sign(d) * jnp.asarray(_FACE_EYE)[exit_ax]
            face = jnp.where((act2 & ~stopped)[..., None], step_norm, face)

        new_active = act2 & valid & ~stopped
        cell = jnp.where(new_active[..., None], next_cell, cell)
        cell_exit = jnp.where(new_active, new_exit, cell_exit)
        return (it + 1, cell, cell_exit, new_active, face, res, n_steps)

    it0 = jnp.asarray(0, jnp.int32)
    _, cell1, cell_exit1, active1, face1, res1, steps1 = jax.lax.while_loop(
        cond, body, (it0, cell0, cell_exit0, active0, face0, res0, steps0))
    return (cell1, cell_exit1, active1, face1, res1, steps1, t_exit)


def _march_finish(carry, t_max) -> MarchHit:
    """Close out a march carry: still-active lanes hit the 255-iteration
    exhaustion — unlit red hit at t = 10 (``SH/Raytracing.hlsl:325-334``)."""
    _, _, still_active, _, result, n_steps, _ = carry
    acc = still_active & (EXHAUSTED_T <= t_max)
    result = MarchHit(
        hit=jnp.where(acc, True, result.hit),
        t=jnp.where(acc, EXHAUSTED_T, result.t),
        kind=jnp.where(acc, KIND_EXHAUSTED, result.kind),
        cell=result.cell, t_in=result.t_in, t_out=result.t_out,
        face_normal=jnp.where(acc[..., None],
                              jnp.asarray([1.0, 0.0, 0.0]),
                              result.face_normal))
    import dataclasses as _dc

    return _dc.replace(result, steps=n_steps)


def _march_core(corner_fetch, voxel_fetch, accel_fetch, n_l, h_l, ext_l,
                accel_mode: str, o, d, t_max, interp: bool,
                debug_overlay: bool, fused: bool = False,
                node_geometry=None, lane_ok=None, t_exit_cap=None,
                voxel_owned=None) -> MarchHit:
    """The march loop over lanes with (possibly per-lane) volume geometry:
    ``_march_begin`` -> ``_march_run`` (full 255-iteration budget) ->
    ``_march_finish``.

    corner_fetch(cell) -> v8 [L,8] (or (v8, accel) when ``fused``);
    voxel_fetch(cell) -> [L]; accel_fetch(cell) -> [L] packed accel;
    n_l/h_l/ext_l are scalars or [L] lane arrays.

    ``node_geometry(cell, av) -> (valid, has_surf, node_lo, node_hi)``
    overrides the skip-node box (default: ``node_box_from_accel``) — the
    slab-sharded march supplies owned-cell boxes plus giant out-of-slab
    spans through this hook, so one loop serves both (VERDICT r2 item 3).
    ``lane_ok`` masks lanes off before the loop; ``t_exit_cap`` clamps the
    traversal exit t (slab chord retirement).  ``voxel_owned(cell)`` gates
    cube-mode solid tests (a slab shard must not claim voxels whose density
    it does not store — its fetch reads 0 there, which cube mode would
    otherwise take as solid).

    The march is gather-bound on TPU, so the fetch strategy is chosen by
    corner-table size (static, from the packed channel count — see
    ``DeviceVolume.from_volume``):

    - ``fused`` (tables <= FUSE_BUDGET_BYTES): ONE 9-channel gather per
      step (8 corners + packed accel).
    - split-phase (larger HBM tables): every step gathers only the 1-byte
      packed accel (node skip + surface flag); the aligned 8-corner row
      needed for root finding is gathered under a ``lax.cond`` that only
      fires on iterations where some lane sits in a surface-flagged cell.

    Both walk the same cells with the same biases and root brackets —
    hits are bit-identical.
    """
    carry = _march_begin(corner_fetch, accel_fetch, n_l, h_l, ext_l,
                         accel_mode, o, d, t_max, interp, fused=fused,
                         node_geometry=node_geometry, lane_ok=lane_ok,
                         t_exit_cap=t_exit_cap)
    carry = _march_run(carry, corner_fetch, voxel_fetch, accel_fetch,
                       n_l, h_l, ext_l, accel_mode, o, d, t_max, interp,
                       debug_overlay, fused=fused,
                       node_geometry=node_geometry, voxel_owned=voxel_owned,
                       max_steps=MAX_ITERATIONS)
    return _march_finish(carry, t_max)


def _make_corner_fetch(vol: DeviceVolume, fetch):
    """-> (corner_fetch, fused): per-cell corner fetch from the packed
    layout (8 scattered voxel gathers when absent).  ``fused`` tables
    (9 channels, VMEM-resident) return (v8, packed_accel) from ONE
    contiguous gather; 8-channel tables return v8 only, paid solely on
    root-finding iterations (see ``_march_core``).  Out-of-range cells
    return zeros (always masked)."""
    if vol.corners is None:
        def legacy(cell):
            return iso.gather_corners(fetch, cell)

        return legacy, False
    cc = vol.corners.shape[0]
    ch = vol.corners.shape[-1]
    flat = vol.corners.reshape(-1, ch)

    def corner_fetch(cell):
        valid = jnp.all((cell >= 0) & (cell + 1 < vol.n), axis=-1)
        ic = jnp.clip(cell, 0, cc - 1)
        idx = (ic[..., 0] * cc + ic[..., 1]) * cc + ic[..., 2]
        vals = jnp.where(valid[..., None], flat[idx], 0.0)
        if ch > 8:
            return vals[..., :8], vals[..., 8].astype(jnp.int32)
        return vals

    return corner_fetch, ch > 8


@partial(jax.jit, static_argnames=("interp", "debug_overlay"))
def march_volume(vol: DeviceVolume, o, d, t_max, interp: bool = True,
                 debug_overlay: bool = False) -> MarchHit:
    """March rays (object space) through one volume.

    o, d: f32 [R,3]; t_max: f32 [R] (DXR TMax / closest-so-far).
    ``interp=True`` is the isosurface mode, ``False`` the cube mode.
    Traversal is non-differentiable by construction (callers resolve
    differentiable quantities afterwards, see ``vrt.march.resolve``).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    vol = jax.lax.stop_gradient(vol)
    fetch = iso.make_fetch(vol.sdf, vol.n)
    corner_fetch, fused = _make_corner_fetch(vol, fetch)
    accel_fetch = lambda cell: _gather_accel(vol.accel, vol.n - 1, cell)
    return _march_core(corner_fetch, fetch, accel_fetch, vol.n,
                       vol.cell_size, vol.extends, vol.accel_mode,
                       o, d, t_max, interp, debug_overlay, fused=fused)


def _lanes_env(vols: DeviceVolume, vol_ids):
    """Fetchers + per-lane geometry for marching lanes against a stacked
    DeviceVolume: -> (fetch, corner_fetch, accel_fetch, fused, n_l, h_l,
    ext_l).  The fetchers close over ``vol_ids``, so a compaction driver
    rebuilds this env after permuting lanes."""
    n_l = vols.n[vol_ids]
    h_l = vols.cell_size[vol_ids]
    ext_l = vols.extends[vol_ids]

    fetch = iso.make_stacked_fetch(vols.sdf, n_l, vol_ids)

    cc = vols.accel.shape[1]
    accel_flat = _accel_u8(vols.accel)

    def accel_fetch(cell):
        valid = jnp.all((cell >= 0) & (cell < (n_l - 1)[..., None]), axis=-1)
        ic = jnp.clip(cell, 0, cc - 1)
        flat = (vol_ids * (cc * cc * cc)
                + (ic[..., 0] * cc + ic[..., 1]) * cc + ic[..., 2])
        vals = jnp.take(accel_flat, flat, axis=0).astype(jnp.int32)
        return jnp.where(valid, vals, 0)

    if vols.corners is not None:
        ccc = vols.corners.shape[1]
        ch = vols.corners.shape[-1]
        corners_flat = vols.corners.reshape(-1, ch)
        fused = ch > 8

        def corner_fetch(cell):
            valid = jnp.all((cell >= 0) & (cell + 1 < n_l[..., None]),
                            axis=-1)
            ic = jnp.clip(cell, 0, ccc - 1)
            idx = (vol_ids * (ccc * ccc * ccc)
                   + (ic[..., 0] * ccc + ic[..., 1]) * ccc + ic[..., 2])
            vals = jnp.where(valid[..., None], corners_flat[idx], 0.0)
            if ch > 8:
                return vals[..., :8], vals[..., 8].astype(jnp.int32)
            return vals
    else:
        fused = False

        def corner_fetch(cell):
            return iso.gather_corners(fetch, cell)

    return fetch, corner_fetch, accel_fetch, fused, n_l, h_l, ext_l


def march_lanes(vols: DeviceVolume, vol_ids, o, d, t_max,
                interp: bool = True,
                debug_overlay: bool = False) -> MarchHit:
    """March lanes against per-lane volumes from a stacked DeviceVolume.

    ``vols`` is stacked over a leading V axis; ``vol_ids`` [L] selects a
    volume per lane.  One while_loop covers every (ray, instance) pair —
    the fused scene traversal.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    vols = jax.lax.stop_gradient(vols)
    fetch, corner_fetch, accel_fetch, fused, n_l, h_l, ext_l = _lanes_env(
        vols, vol_ids)
    return _march_core(corner_fetch, fetch, accel_fetch, n_l, h_l, ext_l,
                       vols.accel_mode, o, d, t_max, interp, debug_overlay,
                       fused=fused)


# ---------------------------------------------------------------------------
# Mid-march compaction: slim carry packing.
#
# v5e row-gather throughput is width-sensitive (measured, 2M rows): 8 f32
# columns (a 32 B row) permute in 17.9 ms, but 16 cols cost 53 ms, 26 cols
# 108 ms, and leaf-wise gathers 437 ms.  The march carry therefore packs
# into EXACTLY two [L,8] f32 matrices — small ints bit-packed, unit/sign
# normals stored as 2-bit trits — so one compaction round costs two 32 B-row
# gathers plus a 2M argsort (~10 ms).
# ---------------------------------------------------------------------------

_TRIT_NAN_BIT = 6


def _encode_trits(f):
    """[L,3] sign/unit-normal vector -> 7-bit code: 2 bits/axis
    (0 zero, 1 positive, 2 negative) + a NaN flag (bit 6).  Covers every
    value the march stores in its face fields: entry-face normals (sign
    triples normalized, NaN when the triple is zero), cube step normals
    (+-unit axes), and zeros."""
    nan = jnp.any(jnp.isnan(f), axis=-1)
    t = jnp.where(f > 0, 1, jnp.where(f < 0, 2, 0)).astype(jnp.int32)
    code = t[..., 0] | (t[..., 1] << 2) | (t[..., 2] << 4)
    return jnp.where(nan, 1 << _TRIT_NAN_BIT, code)


def _decode_trits(code):
    """Inverse of ``_encode_trits``: rebuilds the vector with the SAME
    normalize expression the march used (sign triple / L2 norm), so decoded
    values are bit-identical — including the reference's NaN for a zero
    sign triple at a volume-entry corner."""
    t = jnp.stack([(code >> s) & 3 for s in (0, 2, 4)], axis=-1)
    s = ((t == 1).astype(jnp.float32) - (t == 2).astype(jnp.float32))
    nan = (code >> _TRIT_NAN_BIT) & 1
    n = jnp.linalg.norm(s, axis=-1, keepdims=True)
    unit = jnp.where(n > 0, s / jnp.where(n > 0, n, 1.0), 0.0)
    return jnp.where((nan == 1)[..., None], jnp.nan,
                     jnp.where(n > 0, unit, 0.0))


_NORMAL_BIT = 1 << 30


def _f32(i):
    """Bitcast a (<= 30-bit) int payload into an f32 carry column.  Bit 30
    is forced on so the float is always NORMAL: small ints would otherwise
    bitcast to f32 subnormals, which TPU float paths flush to zero —
    silently corrupting the payload (observed: scrambled lane order after
    the final unpermute).  Bit patterns stay < 0x7F800000, so they are
    never NaN/inf either (NaN payloads are not copy-stable on all paths)."""
    return jax.lax.bitcast_convert_type(
        i.astype(jnp.int32) | _NORMAL_BIT, jnp.float32)


def _i32(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32) & (_NORMAL_BIT - 1)


# meta column bit layout (ray matrix col 7): order | vol(5b) | ok(1b) =
# 30 bits, exactly the payload width _f32 can carry (bit 30 is the forced
# normal-exponent bit).
_ORDER_BITS = 24          # 16.7M lanes: 4K frames (8.3M) plus chunk padding
_VOL_SHIFT = _ORDER_BITS  # 5 bits of volume id
_OK_SHIFT = _ORDER_BITS + 5


def _pack_rays(o, d, t_max, vol, ok, order):
    meta = order | (vol << _VOL_SHIFT) | (ok.astype(jnp.int32) << _OK_SHIFT)
    return jnp.concatenate(
        [o, d, t_max[:, None], _f32(meta)[:, None]], axis=1)


def _unpack_rays(ray8):
    meta = _i32(ray8[:, 7])
    return (ray8[:, 0:3], ray8[:, 3:6], ray8[:, 6],
            (meta >> _VOL_SHIFT) & 31, ((meta >> _OK_SHIFT) & 1) == 1,
            meta & ((1 << _ORDER_BITS) - 1))


def _pack_state(carry):
    """March carry -> [L,8] f32: cell (10 bits/axis, bias +2 — carried
    cells stray at most one cell outside the grid), cell_exit, flags
    (active, res.hit, res.kind, n_steps, two trit-coded normals), res.t,
    res.t_in, res.t_out, res.cell (10 bits/axis), t_exit."""
    cell, cell_exit, active, face, res, n_steps, t_exit = carry
    c = jnp.clip(cell + 2, 0, 1023)
    cellpack = c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)
    rc = jnp.clip(res.cell, 0, 1023)
    rescellpack = rc[..., 0] | (rc[..., 1] << 10) | (rc[..., 2] << 20)
    flags = (active.astype(jnp.int32)
             | (res.hit.astype(jnp.int32) << 1)
             | (res.kind << 2)
             | (jnp.minimum(n_steps, 255) << 5)
             | (_encode_trits(face) << 13)
             | (_encode_trits(res.face_normal) << 20))
    cols = [_f32(cellpack), cell_exit, _f32(flags), res.t, res.t_in,
            res.t_out, _f32(rescellpack), t_exit]
    return jnp.stack(cols, axis=1)


def _unpack_state(st8):
    cellpack = _i32(st8[:, 0])
    cell = jnp.stack([(cellpack >> s) & 1023 for s in (0, 10, 20)],
                     axis=-1) - 2
    flags = _i32(st8[:, 2])
    rescellpack = _i32(st8[:, 6])
    res = MarchHit(
        hit=((flags >> 1) & 1) == 1,
        t=st8[:, 3],
        kind=(flags >> 2) & 7,
        cell=jnp.stack([(rescellpack >> s) & 1023 for s in (0, 10, 20)],
                       axis=-1),
        t_in=st8[:, 4],
        t_out=st8[:, 5],
        face_normal=_decode_trits((flags >> 20) & 127))
    return (cell, st8[:, 1], (flags & 1) == 1,
            _decode_trits((flags >> 13) & 127), res,
            (flags >> 5) & 255, st8[:, 7])


def march_lanes_compact(vols: DeviceVolume, vol_ids, o, d, t_max,
                        interp: bool = True, chunk: int = 8192,
                        schedule: tuple = (8, 247),
                        block: int | None = None,
                        debug_overlay: bool = False) -> MarchHit:
    """``march_lanes`` with mid-march live-lane compaction.

    Lane activity in the march is monotone-decreasing, but a chunk's
    while_loop runs until its SLOWEST lane retires — on the flagship 1080p
    frame that divergence costs 2.4-2.9x the active work (lockstep 9.4 vs
    active 3.3 rows/ray, scripts/probe_steps_hist.py).  This driver marches
    in bounded rounds: before each round, still-live lanes are packed to
    the front, the carry is chunked, and all-dead chunks are skipped by
    ``lax.cond``.  Round budgets must sum to MAX_ITERATIONS, which makes
    the result bit-identical to ``march_lanes`` (an always-active lane sees
    the same 255 iterations; retired lanes' results are frozen in the
    carry; packing is a pure lane permutation undone by the order column).

    Packing granularity:

    - ``block=None`` (row mode): stable argsort on the per-lane activity
      flag + TWO full-width [L,8] row gathers per round — row gathers are
      the dominant round cost (~18 ms/2M rows each), so schedules stay
      short ((8, 247) won round 4's sweep at 479 ms).
    - ``block=B`` (block mode, VERDICT r4 item 3 "compaction without
      global sorts"): lanes move in contiguous B-lane blocks — dead blocks
      sort last, live blocks sort by DESCENDING deepest-lane step count so
      stragglers cluster into the same chunks.  The permute is then a
      block gather (contiguous 32*B-byte rows ~ memcpy speed, not 32 B
      row gathers) over an nb-element argsort, making rounds cheap enough
      for long schedules; the caller's chord sort already clusters
      same-depth rays so per-block liveness stays coherent.  B must
      divide ``chunk``.

    ``o.shape[0]`` must be a multiple of ``chunk`` (callers pad).
    """
    assert sum(schedule) == MAX_ITERATIONS, schedule
    total = o.shape[0]
    assert total < (1 << _ORDER_BITS), total
    # Packed-carry capacity guards (the bit layout of _pack_rays /
    # _pack_state): 5-bit volume ids, 10-bit cell coordinates with bias +2
    # (carried cells stray at most one cell outside the grid).  Violations
    # would corrupt lanes silently, so fail at trace time instead.
    assert vols.sdf.shape[0] <= 32, (
        f"compact march carries 5-bit volume ids; got {vols.sdf.shape[0]} "
        "stacked volumes")
    assert vols.sdf.shape[1] <= 1022, (
        f"compact march packs cells into 10 bits/axis (bias +2); grid axis "
        f"{vols.sdf.shape[1]} exceeds 1022 voxels")
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    vols = jax.lax.stop_gradient(vols)

    # Internal pad to the round-chunk multiple: the compaction rounds use
    # WIDE chunks (the in-loop gather issue rate grows with lane width —
    # 82M u8 rows/s at 64k lanes vs ~45M at 8k) independent of the
    # caller's shading chunk size.  Pad lanes carry t_max=-inf -> dead.
    pad = (-total) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max_p = jnp.concatenate([t_max, jnp.full(pad, -jnp.inf)])
        vol_ids = jnp.concatenate(
            [vol_ids, jnp.zeros(pad, vol_ids.dtype)])
    else:
        t_max_p = t_max
    t_max_unpadded = t_max
    t_max = t_max_p
    total_padded = total + pad

    # Gather-free liveness key for the first packing: the slab test (the
    # march's own entry precondition).  ``_march_begin``'s entry gathers
    # then run only inside live chunks — sky-dominated chunks never pay
    # them, matching the per-chunk cond-skip of the un-compacted pipeline.
    ext_l = vols.extends[vol_ids]
    ok0, _, _ = ray_aabb(o, d, -ext_l[..., None], ext_l[..., None], t_max)

    order = jnp.arange(total_padded, dtype=jnp.int32)
    ray8 = _pack_rays(o, d, t_max, vol_ids.astype(jnp.int32), ok0, order)

    def dead_carry(oc):
        zf = oc[:, 0] * 0.0
        zi = zf.astype(jnp.int32)
        return (zi[..., None] + jnp.zeros(3, jnp.int32), zf, zi != 0,
                oc * 0.0, MarchHit.none_like(oc), zi, zf)

    if block is not None:
        assert chunk % block == 0 and total_padded % block == 0, (
            chunk, block, total_padded)

    st8 = None
    bcomp = None  # composed block permutation (block mode)
    for i, k in enumerate(schedule):
        if i == 0:
            live = _unpack_rays(ray8)[4]
        else:
            live = (_i32(st8[:, 2]) & 1) == 1      # active flag
        if block is not None:
            nb = total_padded // block
            lv = live.reshape(nb, block)
            blive = jnp.any(lv, axis=1)
            if i == 0:
                bdepth = jnp.zeros(nb, jnp.int32)
            else:
                steps = (_i32(st8[:, 2]) >> 5) & 255
                bdepth = jnp.max(jnp.where(lv, steps.reshape(nb, block),
                                           -1), axis=1)
            # dead blocks last; live blocks deepest-first (stragglers
            # cluster into the same chunks)
            bkey = jnp.where(blive, -bdepth, jnp.iinfo(jnp.int32).max)
            border = jnp.argsort(bkey, stable=True)
            bcomp = border if bcomp is None else bcomp[border]
            ray8 = ray8.reshape(nb, block, 8)[border].reshape(-1, 8)
            if st8 is not None:
                st8 = st8.reshape(nb, block, 8)[border].reshape(-1, 8)
        else:
            perm = jnp.argsort(~live, stable=True)
            ray8 = ray8[perm]
            st8 = None if st8 is None else st8[perm]

        def run_chunk(s, k=k, first=(i == 0)):
            r8 = s[0]
            oc, dc, tc, vc, okc, _ = _unpack_rays(r8)

            def live(_):
                fetch_c, cf_c, af_c, fz, n_c, h_c, e_c = _lanes_env(
                    vols, vc)
                if first:
                    carry_c = _march_begin(
                        cf_c, af_c, n_c, h_c, e_c, vols.accel_mode,
                        oc, dc, tc, interp, fused=fz)
                else:
                    carry_c = _unpack_state(s[1])
                carry_c = _march_run(
                    carry_c, cf_c, fetch_c, af_c, n_c, h_c, e_c,
                    vols.accel_mode, oc, dc, tc, interp,
                    debug_overlay, fused=fz, max_steps=k)
                return _pack_state(carry_c)

            def dead(_):
                return (_pack_state(dead_carry(oc)) if first else s[1])

            live_now = okc if first else ((_i32(s[1][:, 2]) & 1) == 1)
            return jax.lax.cond(jnp.any(live_now), live, dead, None), r8

        args = ((ray8.reshape(-1, chunk, 8),) if st8 is None
                else (ray8.reshape(-1, chunk, 8),
                      st8.reshape(-1, chunk, 8)))
        st8, ray8 = jax.lax.map(run_chunk, args)
        st8 = st8.reshape(-1, 8)
        ray8 = ray8.reshape(-1, 8)

    if bcomp is not None:
        # blocks moved as units and lanes inside a block never reordered:
        # restore with the inverse of the COMPOSED block permutation — a
        # tiny nb-element argsort + one contiguous block gather, instead
        # of the full-width row sort+gather the order column needs
        nb = total_padded // block
        st8 = st8.reshape(nb, block, 8)[jnp.argsort(bcomp)].reshape(-1, 8)
    else:
        order_now = _unpack_rays(ray8)[5]
        st8 = st8[jnp.argsort(order_now)]
    if pad:
        st8 = st8[:total]
    carry = _unpack_state(st8)
    return _march_finish(carry, t_max_unpadded)


def march_lanes_chunked(vols: DeviceVolume, vol_ids, o, d, t_max,
                        interp: bool = True, chunk: int = 8192,
                        debug_overlay: bool = False) -> MarchHit:
    """``march_lanes`` over fixed chunks with a slab-test cond-skip per
    chunk — the frame-level marcher for candidate passes whose live
    fraction is too small to amortize compaction's sorts (later TLAS
    candidates, where the first pass already resolved most rays)."""
    total = o.shape[0]
    assert total % chunk == 0, (total, chunk)
    ext_l = vols.extends[vol_ids]
    ok, _, _ = ray_aabb(o, d, -ext_l[..., None], ext_l[..., None], t_max)

    def one(x):
        idc, oc, dc, tc, okc = x

        def live(_):
            return march_lanes(vols, idc, oc, dc, tc, interp=interp,
                               debug_overlay=debug_overlay)

        def dead(_):
            import dataclasses as _dc

            h = MarchHit.none_like(oc)
            return _dc.replace(h, steps=jnp.zeros(oc.shape[0], jnp.int32))

        return jax.lax.cond(jnp.any(okc), live, dead, None)

    out = jax.lax.map(one, (vol_ids.reshape(-1, chunk),
                            o.reshape(-1, chunk, 3),
                            d.reshape(-1, chunk, 3),
                            t_max.reshape(-1, chunk),
                            ok.reshape(-1, chunk)))
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)


COMPACT_SCHEDULE_ENV = "VRT_COMPACT_SCHEDULE"
COMPACT_BLOCK_ENV = "VRT_COMPACT_BLOCK"


def make_compact_marcher(chunk: int = 8192, march_chunk: int = 65536,
                         schedule: tuple | None = None,
                         block: int | None = "default"):
    """Lane-marcher factory for ``march_scene``'s sequential candidate
    passes: the FIRST pass (which carries nearly all march work) gets
    mid-march compaction over WIDE chunks (``march_chunk`` — the in-loop
    gather rate grows with lane width, and compaction caps the divergence
    cost wide chunks would otherwise pay); later passes — already mostly
    retired by the closest-hit t_max clamp — get the cheap chunked march
    at the caller's shading granularity, whose full-width sorts they
    could not amortize.  Create one marcher per march_scene call (the
    counter is per-instance).

    Defaults are the round-5 sweep winner (scripts/probe_block_compact.py:
    block512 (2,4,8,16,32,64,129) marched the flagship frame in 415 ms vs
    470 for round 4's row-mode (8,247) — block packing makes rounds cheap
    enough for long schedules).  The ``VRT_COMPACT_SCHEDULE`` /
    ``VRT_COMPACT_BLOCK`` env vars override for A/B measurement — read at
    TRACE time, so set them only for fresh processes ("0" block = row
    mode)."""
    import os as _os

    if schedule is None:
        schedule = tuple(int(x) for x in _os.environ.get(
            COMPACT_SCHEDULE_ENV, "2,4,8,16,32,64,129").split(","))
    if block == "default":
        block = int(_os.environ.get(COMPACT_BLOCK_ENV, "512")) or None
    calls = {"n": 0}

    def marcher(vols, vol_ids, o, d, t_max, interp=True,
                debug_overlay=False):
        j = calls["n"]
        calls["n"] += 1
        if j == 0:
            return march_lanes_compact(vols, vol_ids, o, d, t_max,
                                       interp=interp, chunk=march_chunk,
                                       schedule=schedule, block=block,
                                       debug_overlay=debug_overlay)
        return march_lanes_chunked(vols, vol_ids, o, d, t_max,
                                   interp=interp, chunk=chunk,
                                   debug_overlay=debug_overlay)

    return marcher
