"""Differentiable hit resolution.

The march loop (``vrt.march.march``) is traversal: it decides *which* cell a
ray hits and in which t-bracket — decisions that are piecewise constant in
the SDF values, so they are computed under ``stop_gradient``.  This module
recomputes the continuously-varying quantities — hit t and surface normal —
as differentiable functions of the SDF grid and the ray, so pixel losses
backprop into voxel SDF values and camera pose.

Gradient model:

- **surface hits**: the hit t is the root of F(t) = trilinear SDF along the
  ray inside the hit cell.  We keep the reference's root *value* (2x regula
  falsi + secant, bit-identical to ``GetSurfaceIntersectionT``) and attach
  the implicit-function-theorem gradient dt/dtheta = -(dF/dtheta)/(dF/dt)
  via a zero-valued Newton correction:

      t_diff = t0 - (F(t0) - stop_grad(F(t0))) / stop_grad(F'(t0))

  whose value is exactly t0 and whose derivative is the IFT derivative.
- **solid-entry hits**: t is the (biased) volume slab entry — recomputed
  differentiably from the ray and the volume extent.
- **cube / exhausted hits**: t is piecewise constant (face crossings /
  the constant 10) — kept stop-gradient.
- **normals**: central differences of the trilinear field at the hit point
  (``GetNormal``) are differentiable in the SDF gathers directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vrt.march import isosurface as iso
from vrt.march.march import _inv_dir
from vrt.march.types import (DeviceVolume, MarchHit, KIND_DEBUG,
                             KIND_EXHAUSTED, KIND_SOLID_ENTRY, KIND_SURFACE)


def _slab_enter(o, d, ext):
    """Differentiable slab-entry t (gradient flows through the selected
    entry plane only; degenerate axes contribute -inf as in the march)."""
    d_s = jax.lax.stop_gradient(d)
    finite = d_s != 0.0
    sel_min = jnp.where(d_s > 0.0, -ext, ext)
    tmin3 = (sel_min - o) * jnp.where(finite, 1.0 / jnp.where(finite, d, 1.0), 0.0)
    tmin3 = jnp.where(finite, tmin3, -jnp.inf)
    return jnp.max(tmin3, axis=-1)


def resolve_hits(fetch, cell_size, extends, o, d, hit: MarchHit,
                 cfetch=None):
    """-> (t f32[R], normal_object_space f32[R,3], unlit bool[R]).

    ``fetch`` is an isosurface-style voxel fetch (single-volume or stacked
    per-ray); ``cfetch`` optionally supplies a per-cell 8-corner fetch (the
    packed layout, one gather per cell) — falls back to voxel gathers.
    ``cell_size``/``extends`` broadcast against [R].  Only meaningful on
    lanes with ``hit.hit``.
    """
    if cfetch is None:
        cfetch = iso.corner_fetch_from_voxels(fetch)
    cell = hit.cell
    h = jnp.broadcast_to(jnp.asarray(cell_size), hit.t.shape)
    ext = jnp.broadcast_to(jnp.asarray(extends), hit.t.shape)
    cell_base = cell.astype(jnp.float32) * h[..., None] - ext[..., None]

    # ---- surface hits: IFT-corrected root + central-difference normal ----
    # All 7 cells the surface terms read (the hit cell + its 6 central-
    # difference neighbors) fetch in ONE batched gather: the backward then
    # pays one segment-summed cotangent accumulation instead of 7 separate
    # scatter-adds into the corner table (the dominant backward cost at
    # 1080p — see BENCH.md backward phase table).
    offs7 = np.concatenate([np.zeros((1, 3), np.int32),
                            iso.NEIGHBOR_OFFSETS])
    rows7 = cfetch(cell[:, None, :] + offs7)                   # [R,7,8]
    v_c = rows7[:, 0]

    t0 = jax.lax.stop_gradient(hit.t)
    t0_safe = jnp.where(jnp.isfinite(t0), t0, 0.0)

    def field(t):
        p = (o + d * t[..., None] - cell_base) / h[..., None]
        return iso.trilinear_rows(v_c, p)

    f0, fp = jax.jvp(field, (t0_safe,), (jnp.ones_like(t0_safe),))
    fp_s = jax.lax.stop_gradient(fp)
    safe = jnp.isfinite(fp_s) & (jnp.abs(fp_s) > 1e-12)
    corr = (f0 - jax.lax.stop_gradient(f0)) / jnp.where(safe, fp_s, 1.0)
    t_surface = t0_safe - jnp.where(safe, corr, 0.0)

    p_hit = (o + d * t_surface[..., None] - cell_base) / h[..., None]
    n_surface = iso.central_difference_normal_rows(rows7[:, 1:], p_hit)

    # ---- solid-entry hits: differentiable biased slab entry --------------
    t_solid = _slab_enter(o, d, ext[..., None]) + 0.01

    # ---- compose by kind -------------------------------------------------
    kind = hit.kind
    t = jnp.where(kind == KIND_SURFACE, t_surface,
                  jnp.where(kind == KIND_SOLID_ENTRY, t_solid,
                            jax.lax.stop_gradient(hit.t)))
    unlit = (kind == KIND_EXHAUSTED) | (kind == KIND_DEBUG)
    red = jnp.zeros_like(hit.face_normal).at[..., 0].set(1.0)
    normal = jnp.where((kind == KIND_SURFACE)[..., None], n_surface,
                       jnp.where((kind == KIND_DEBUG)[..., None], red,
                                 hit.face_normal))
    return t, normal, unlit


def resolve_volume_hits(vol: DeviceVolume, o, d, hit: MarchHit):
    """Single-volume convenience wrapper."""
    fetch = iso.make_fetch(vol.sdf, vol.n)
    return resolve_hits(fetch, vol.cell_size, vol.extends, o, d, hit)
