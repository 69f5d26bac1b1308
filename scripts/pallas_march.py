"""RETIRED Pallas TPU kernel for the isosurface march — kept as a record.

Demoted from ``vrt/march/`` in round 3 (VERDICT r2 item 10): the on-chip
bake-off (``scripts/probe_gather4/5.py``, ``probe_table_cliff.py``,
``probe_march_body.py``) showed the march is gather-issue-rate bound and
XLA's gather already sits at that wall, so the production fetch
architecture (fused VMEM rows / split-phase u8 accel) replaced this kernel;
it has no production call sites.  ``tests/test_pallas.py`` still
cross-checks it (interpret mode) so the record stays executable.

Original header:

Pallas TPU kernel for the isosurface march (VMEM-resident volumes).

For volumes whose SDF + accel fit in VMEM (<= ~64^3 cells corner-packed,
~9 MB), this kernel pins the whole volume on-chip for the entire march:
every per-step fetch is a VMEM gather instead of an HBM gather, removing
the march's HBM round-trips entirely.  Rays are tiled over the Pallas grid
(TILE rays per program, shaped for the 8x128 VPU); each program runs the
same masked DDA loop as the XLA path (``vrt.march.march``) with identical
semantics, so the two paths are interchangeable and cross-checked in tests.

Layout notes (see pallas_guide.md):
- the SDF is passed corner-packed ``[C^3, 8]`` so a cell's 8 corners are
  one row — gathers fetch along the sublane dimension with a flat index,
- the accel field rides as ``[C^3]`` int32,
- per-ray state lives in registers/VMEM vectors of shape [TILE],
- the fixed 255-step cap bounds the ``fori_loop``; an all-lanes-done early
  exit is handled by the enclosing while_loop condition.

The kernel covers the hot path (interp-mode primary/shadow marches).  Cube
mode, solid-entry handling and hit classification match ``march_volume``;
callers fall back to the XLA path automatically when the volume exceeds the
VMEM budget or Pallas is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vrt.march import isosurface as iso
from vrt.march.march import MAX_ITERATIONS, EXHAUSTED_T

_CORNER_OFFSETS = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                   (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]


def _cubic_coeffs8(v8, a1, b1):
    """Unrolled, constant-free cubic coefficients (Pallas kernels cannot
    capture array constants; mirrors iso.cubic_coefficients)."""
    a = [a1[..., 0], a1[..., 1], a1[..., 2]]
    b = [b1[..., 0], b1[..., 1], b1[..., 2]]
    A = B = C = D = 0.0
    for i, off in enumerate(_CORNER_OFFSETS):
        ax = [a[j] if off[j] else 1.0 - a[j] for j in range(3)]
        bx = [b[j] if off[j] else -b[j] for j in range(3)]
        v = v8[..., i]
        A = A + bx[0] * bx[1] * bx[2] * v
        D = D + ax[0] * ax[1] * ax[2] * v
        B = B + (ax[0] * bx[1] * bx[2] + bx[0] * ax[1] * bx[2]
                 + bx[0] * bx[1] * ax[2]) * v
        C = C + (bx[0] * ax[1] * ax[2] + ax[0] * bx[1] * ax[2]
                 + ax[0] * ax[1] * bx[2]) * v
    return A, B, C, D
from vrt.march.types import (DeviceVolume, MarchHit, KIND_EXHAUSTED,
                             KIND_SOLID_ENTRY, KIND_SURFACE)

TILE = 1024  # rays per program (8 sublanes x 128 lanes)

# VMEM budget: corners [C^3,8] f32 + accel [C^3] i32 + working set.
VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def fits_in_vmem(vol: DeviceVolume) -> bool:
    if vol.corners is None:
        return False
    c = vol.corners.shape[0]
    return (c ** 3) * (8 * 4 + 4) <= VMEM_LIMIT_BYTES


def _kernel(params_ref, o_ref, d_ref, tmax_ref, corners_ref, accel_ref,
            hit_ref, t_ref, kind_ref, cell_ref, tin_ref, tout_ref, fn_ref):
    """One ray tile against the VMEM-resident volume."""
    n = params_ref[0]          # voxels per axis (actual)
    cc = params_ref[1]         # cells per axis (padded array side)
    h = params_ref[2]          # cell size (bitcast f32)
    ext = params_ref[3]        # extends (bitcast f32)
    h = jax.lax.bitcast_convert_type(h, jnp.float32)
    ext = jax.lax.bitcast_convert_type(ext, jnp.float32)
    nf = n.astype(jnp.float32)
    del nf

    o = o_ref[:]               # [TILE,3]
    d = d_ref[:]
    t_max = tmax_ref[:]        # [TILE]

    inv = jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), -jnp.inf)

    # slab test vs the volume box
    sel_min = jnp.where(d > 0.0, -ext, ext)
    sel_max = jnp.where(d > 0.0, ext, -ext)
    tmin3 = (sel_min - o) * inv
    tmax3 = (sel_max - o) * inv
    t_enter = jnp.max(tmin3, axis=-1)
    t_exit = jnp.min(tmax3, axis=-1)
    ok = (t_exit > t_enter) & (t_exit >= 0.0) & (t_enter <= t_max)

    def pos_to_cell(p):
        return jnp.floor((p + ext) / h).astype(jnp.int32)

    def corner_gather(cell):
        valid = jnp.all((cell >= 0) & (cell + 1 < n), axis=-1)
        ic = jnp.clip(cell, 0, cc - 1)
        flat = (ic[..., 0] * cc + ic[..., 1]) * cc + ic[..., 2]
        vals = corners_ref[flat]          # [TILE,8] gather
        return jnp.where(valid[..., None], vals, 0.0), valid

    def accel_gather(cell):
        valid = jnp.all((cell >= 0) & (cell < n - 1), axis=-1)
        ic = jnp.clip(cell, 0, cc - 1)
        flat = (ic[..., 0] * cc + ic[..., 1]) * cc + ic[..., 2]
        return jnp.where(valid, accel_ref[flat], 0)

    def get_node(cell):
        valid = jnp.all((cell >= 0) & (cell + 1 < n), axis=-1)
        av = accel_gather(cell)
        level = av >> 1
        has_surface = (av & 1) == 1
        origin = (cell >> level[..., None]) << level[..., None]
        node_pos = origin.astype(jnp.float32) * h - ext
        node_size = jnp.exp2(level.astype(jnp.float32)) * h
        node_pos = jnp.where(valid[..., None], node_pos, -1.0)
        node_size = jnp.where(valid, node_size, 0.0)
        return valid, has_surface, node_pos, node_size

    def node_exit(node_pos, node_size):
        sel = jnp.where(d > 0.0, node_pos + node_size[..., None], node_pos)
        tm = jnp.where(d != 0.0, (sel - o) * inv, 1e5)
        return jnp.min(tm, axis=-1)

    # ---- entry ----------------------------------------------------------
    pos_branch = t_enter >= 0.0
    t_enter_b = jnp.where(pos_branch, t_enter + 0.01, t_enter)
    entry_pos = o + d * t_enter_b[..., None]
    cell0 = jnp.where(pos_branch[..., None], pos_to_cell(entry_pos),
                      pos_to_cell(o))
    valid0, _, node_pos0, node_size0 = get_node(cell0)
    fwd_exit = node_exit(node_pos0, node_size0)
    cell_exit0 = jnp.where(pos_branch, t_enter_b, -fwd_exit + 0.01)

    # entry face normal (solid-entry kinds)
    rp = o + d * (t_enter_b - 0.1)[..., None]
    en = jnp.sign(rp - ext)
    en = jnp.where(en < 0.0, jnp.where(rp < -ext, -1.0, 0.0), en)
    en_n2 = jnp.sum(en * en, axis=-1, keepdims=True)
    entry_norm = en / jnp.sqrt(jnp.where(en_n2 > 0, en_n2, 1.0))

    hit = jnp.zeros((TILE,), jnp.bool_)
    t_best = jnp.full((TILE,), np.inf, jnp.float32)
    kind = jnp.zeros((TILE,), jnp.int32)
    cell_best = jnp.zeros((TILE, 3), jnp.int32)
    t_in_best = jnp.zeros((TILE,), jnp.float32)
    t_out_best = jnp.zeros((TILE,), jnp.float32)
    face = jnp.zeros((TILE, 3), jnp.float32)

    corners0, _ = corner_gather(cell0)
    solid0 = jnp.all(corners0 < 0.0, axis=-1)
    rep0 = ok & valid0 & solid0
    acc0 = rep0 & (t_enter_b >= 0.0) & (t_enter_b <= t_max)
    hit = jnp.where(acc0, True, hit)
    t_best = jnp.where(acc0, t_enter_b, t_best)
    kind = jnp.where(acc0, KIND_SOLID_ENTRY, kind)
    cell_best = jnp.where(acc0[..., None], cell0, cell_best)
    face = jnp.where(acc0[..., None], entry_norm, face)
    active = ok & ~rep0

    # ---- march loop -----------------------------------------------------
    def body(state):
        (it, cell, cell_exit, act, hit, t_best, kind, cell_best,
         t_in_best, t_out_best) = state
        past = cell_exit > t_exit
        act2 = act & ~past
        cell_enter = cell_exit

        valid, has_surf, node_pos, node_size = get_node(cell)
        exit_t = node_exit(node_pos, node_size)
        new_exit = exit_t + 0.1
        next_cell = pos_to_cell(o + d * new_exit[..., None])

        v8, _ = corner_gather(cell)
        p_in = o + d * cell_enter[..., None]
        p_out = o + d * new_exit[..., None]
        cell_base = cell.astype(jnp.float32) * h - ext
        a1 = (p_in - cell_base) / node_size[..., None]
        b1 = (p_out - cell_base) / node_size[..., None] - a1
        A, B, C, D = _cubic_coeffs8(v8, a1, b1)
        root_hit, t_hit = iso.surface_intersection(A, B, C, D, cell_enter,
                                                   new_exit)
        rep = act2 & valid & has_surf & root_hit
        accd = rep & (t_hit >= 0.0) & (t_hit <= t_max)
        hit = jnp.where(accd, True, hit)
        t_best = jnp.where(accd, t_hit, t_best)
        kind = jnp.where(accd, KIND_SURFACE, kind)
        cell_best = jnp.where(accd[..., None], cell, cell_best)
        t_in_best = jnp.where(accd, cell_enter, t_in_best)
        t_out_best = jnp.where(accd, new_exit, t_out_best)

        new_active = act2 & valid & ~rep
        cell = jnp.where(new_active[..., None], next_cell, cell)
        cell_exit = jnp.where(new_active, new_exit, cell_exit)
        return (it + 1, cell, cell_exit, new_active, hit, t_best, kind,
                cell_best, t_in_best, t_out_best)

    def cond(state):
        it, _, _, act, *_ = state
        return jnp.any(act) & (it < MAX_ITERATIONS)

    state = (jnp.asarray(0, jnp.int32), cell0, cell_exit0, active, hit,
             t_best, kind, cell_best, t_in_best, t_out_best)
    state = jax.lax.while_loop(cond, body, state)
    (_, _, _, still, hit, t_best, kind, cell_best, t_in_best,
     t_out_best) = state

    acc = still & (EXHAUSTED_T <= t_max)
    hit = jnp.where(acc, True, hit)
    t_best = jnp.where(acc, EXHAUSTED_T, t_best)
    kind = jnp.where(acc, KIND_EXHAUSTED, kind)
    ones = jnp.ones_like(t_best)
    zeros = jnp.zeros_like(t_best)
    red = jnp.stack([ones, zeros, zeros], axis=-1)
    face = jnp.where(acc[..., None], red, face)

    hit_ref[:] = hit
    t_ref[:] = t_best
    kind_ref[:] = kind
    cell_ref[:] = cell_best
    tin_ref[:] = t_in_best
    tout_ref[:] = t_out_best
    fn_ref[:] = face


@functools.partial(jax.jit, static_argnames=("interpret",))
def march_volume_pallas(vol: DeviceVolume, o, d, t_max,
                        interpret: bool = False) -> MarchHit:
    """Pallas VMEM-resident march (interp mode).  Semantics match
    ``march_volume(..., interp=True)``; cross-checked in tests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert vol.corners is not None, "pallas march needs the packed layout"
    assert vol.accel_mode == "octree", "pallas march: octree accel only"
    o = jax.lax.stop_gradient(jnp.asarray(o, jnp.float32))
    d = jax.lax.stop_gradient(jnp.asarray(d, jnp.float32))
    t_max = jnp.asarray(t_max, jnp.float32)

    r = o.shape[0]
    pad = (-r) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.full(pad, -1.0, jnp.float32)])
    tiles = (r + pad) // TILE

    cc = vol.corners.shape[0]
    corners_flat = vol.corners.reshape(cc * cc * cc, -1)[:, :8]
    accel_flat = vol.accel.reshape(-1)

    params = jnp.stack([
        vol.n.astype(jnp.int32),
        jnp.asarray(cc, jnp.int32),
        jax.lax.bitcast_convert_type(vol.cell_size, jnp.int32),
        jax.lax.bitcast_convert_type(vol.extends, jnp.int32)])

    grid = (tiles,)
    ray_spec = pl.BlockSpec((TILE, 3), lambda i: (i, 0))
    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,))

    out_shapes = (
        jax.ShapeDtypeStruct((tiles * TILE,), jnp.bool_),
        jax.ShapeDtypeStruct((tiles * TILE,), jnp.float32),
        jax.ShapeDtypeStruct((tiles * TILE,), jnp.int32),
        jax.ShapeDtypeStruct((tiles * TILE, 3), jnp.int32),
        jax.ShapeDtypeStruct((tiles * TILE,), jnp.float32),
        jax.ShapeDtypeStruct((tiles * TILE,), jnp.float32),
        jax.ShapeDtypeStruct((tiles * TILE, 3), jnp.float32),
    )
    out_specs = (lane_spec, lane_spec, lane_spec, ray_spec, lane_spec,
                 lane_spec, ray_spec)

    hit, t, kind, cell, t_in, t_out, face = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            ray_spec, ray_spec, lane_spec,           # o, d, t_max
            pl.BlockSpec(memory_space=pltpu.ANY),    # corners (resident)
            pl.BlockSpec(memory_space=pltpu.ANY),    # accel (resident)
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(params, o, d, t_max, corners_flat, accel_flat)

    return MarchHit(hit=hit[:r], t=t[:r], kind=kind[:r], cell=cell[:r],
                    t_in=t_in[:r], t_out=t_out[:r], face_normal=face[:r])
