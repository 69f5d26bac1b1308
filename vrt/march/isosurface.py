"""Trilinear-cubic isosurface intersection and normals.

The trilinear SDF interpolant restricted to a ray segment [t_in, t_out]
through a cell is a cubic A*tau^3 + B*tau^2 + C*tau + D in the normalized
segment parameter tau in [0,1].  Coefficients, bracket shrinking at the
cubic's extrema, and the 2x regula-falsi + final secant refinement reproduce
``GetDensityPolynomial`` / ``GetSurfaceIntersectionT``
(``SH/Include/Voxel.hlsli:552-605, 691-781``) exactly; trilinear sampling and
central-difference normals reproduce ``GetDensity`` / ``GetNormal``
(``:607-684, 783-804``).

Voxel access goes through a *fetch* callable ``fetch(idx[...,3]) -> f32``
so the same math serves a single volume (the march loop) and per-ray
volume-indexed gathers (scene-level hit resolution).  Out-of-bounds fetches
return 0.0, matching D3D typed-SRV out-of-bounds semantics that the
reference's normal estimation relies on.

Everything is elementwise over ray lanes (shape [R]) and written with
``jnp.where`` selects, so it is differentiable almost everywhere — the same
code serves the (stop-gradient) march loop and the differentiable
hit-resolve pass.
"""

from __future__ import annotations

import contextlib as _contextlib

import jax
import jax.numpy as jnp
import numpy as np

# Cell corner order v1..v8 = (0,0,0),(1,0,0),(0,1,0),(1,1,0),(0,0,1),(1,0,1),
# (0,1,1),(1,1,1) — VOXEL_COORDS (VR/Voxel/Private/Voxel.cpp:67-76).
CORNERS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                    [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int32)


def make_fetch(sdf, n):
    """Fetch for one volume: sdf [N,N,N] (padded), n = actual voxels/axis."""
    nn = sdf.shape[0]
    flat_sdf = sdf.reshape(-1)

    def fetch(idx):
        valid = jnp.all((idx >= 0) & (idx < n), axis=-1)
        ic = jnp.clip(idx, 0, nn - 1)
        flat = ic[..., 0] * (nn * nn) + ic[..., 1] * nn + ic[..., 2]
        return jnp.where(valid, jnp.take(flat_sdf, flat, axis=0), 0.0)

    return fetch


def make_stacked_fetch(sdf_stacked, n_per_ray, vol_per_ray):
    """Fetch with per-ray volume selection.

    sdf_stacked [V,N,N,N]; n_per_ray i32 [R]; vol_per_ray i32 [R].  Index
    arrays passed to the fetch must have shape [R, ..., 3].
    """
    v_count, nn = sdf_stacked.shape[0], sdf_stacked.shape[1]
    flat_sdf = sdf_stacked.reshape(-1)

    def fetch(idx):
        extra = idx.ndim - 2
        n = n_per_ray.reshape(n_per_ray.shape + (1,) * extra)
        v = vol_per_ray.reshape(vol_per_ray.shape + (1,) * extra)
        valid = jnp.all((idx >= 0) & (idx < n[..., None]), axis=-1)
        ic = jnp.clip(idx, 0, nn - 1)
        flat = (v * (nn * nn * nn) + ic[..., 0] * (nn * nn)
                + ic[..., 1] * nn + ic[..., 2])
        return jnp.where(valid, jnp.take(flat_sdf, flat, axis=0), 0.0)

    return fetch


def gather_corners(fetch, cell):
    """8 corner SDF values for cells ``cell`` [R,...,3] -> [R,...,8]."""
    idx = cell[..., None, :] + CORNERS  # [R,...,8,3]
    return fetch(idx)


def corner_fetch_from_voxels(fetch):
    """Adapt a voxel fetch into a per-cell 8-corner fetch."""
    return lambda cell: gather_corners(fetch, cell)


def make_stacked_corner_fetch(corners, n_per_ray, vol_per_ray):
    """Per-cell corner fetch from the packed [V,C,C,C,8|9] layout with
    per-ray volume selection — ONE contiguous gather per cell instead of 8
    scattered voxel gathers.  Accepts cells shaped [R, ..., 3] (extra dims
    between the ray axis and the coordinate axis).  Out-of-range cells
    return zeros.

    Differentiability: gathers flow gradients into ``corners`` through
    ``take_rows`` (a sort+segment-sum transpose instead of XLA's
    scatter-add); when the packed layout is produced in-graph from the SDF
    (``vrt.diff.fit.rebuild_accel``), pixel gradients reach the SDF through
    the packing slices exactly as through direct voxel gathers.
    """
    cc = corners.shape[1]
    ch = corners.shape[-1]
    flat = corners.reshape(-1, ch)

    def cfetch(cell):
        extra = cell.ndim - 2
        n = n_per_ray.reshape(n_per_ray.shape + (1,) * extra)
        v = vol_per_ray.reshape(vol_per_ray.shape + (1,) * extra)
        valid = jnp.all((cell >= 0) & (cell + 1 < n[..., None]), axis=-1)
        ic = jnp.clip(cell, 0, cc - 1)
        idx = (v * (cc * cc * cc)
               + (ic[..., 0] * cc + ic[..., 1]) * cc + ic[..., 2])
        return jnp.where(valid[..., None], take_rows(flat, idx)[..., :8],
                         0.0)

    return cfetch


# ---------------------------------------------------------------------------
# Row-table gather with a sort+segment-sum transpose.
#
# XLA transposes ``table[idx]`` into a scatter-add; on TPU v5e that runs
# ~6x slower than sort+gather at the fit step's shapes (measured 183 ms vs
# ~30 ms at 2M rows, vrt/render/renderer.py:547).  Hit-cell indices are
# duplicate-heavy (adjacent rays hit the same cells), so the cotangent
# first collapses duplicate rows with a segment-sum over the sorted run,
# then issues ONE sorted+unique scatter of the surviving rows.
# ---------------------------------------------------------------------------


def _segsum_transpose(idx, g, nrows):
    """Transpose of ``table[idx]`` for flat idx [L], g [L,C]: accumulate
    duplicate rows by sorted segment-sum, then scatter unique rows
    (``indices_are_sorted`` + ``unique_indices`` let XLA skip the
    sort/combine passes a general scatter-add needs)."""
    r = idx.shape[0]
    order = jnp.argsort(idx)
    si = idx[order]
    sg = g[order]
    first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    seg = jnp.cumsum(first) - 1
    sums = jax.ops.segment_sum(sg, seg, num_segments=r,
                               indices_are_sorted=True)
    nseg = jnp.sum(first.astype(jnp.int32))
    firsts = jnp.nonzero(first, size=r, fill_value=0)[0]
    # empty segments (ids >= nseg) target out-of-bounds -> dropped
    tgt = jnp.where(jnp.arange(r) < nseg, si[firsts], nrows)
    return jnp.zeros((nrows, g.shape[1]), g.dtype).at[tgt].add(
        sums, mode="drop", indices_are_sorted=True, unique_indices=True)


# Default FALSE: measured on TPU v5e at the fit step's real shapes
# (scripts/probe_scatter_modes.py, 2M duplicate-heavy rows into a 524k-row
# table): plain scatter-add 188 ms, 16k-chunked scatter 92 ms (the remat'd
# backward's actual shape), sorted scatter 219 ms, segment-sum 410 ms —
# XLA's TPU scatter-add beats the sort+segment-sum rewrite once the
# scatters are chunk-sized, so the custom transpose stays available but
# off.  (VERDICT r4 item 1 hypothesized the opposite; this is the
# measurement.)
_SEGSUM_TRANSPOSE = False


@_contextlib.contextmanager
def plain_gather_transpose():
    """Trace-time opt-out of the custom segment-sum transpose.

    ``shard_map``'s static replication (vma) inference cannot see inside a
    ``custom_vjp``, so differentiated shard_map'd paths (the DP / slab fit
    steps) wrap their body traces in this context: ``take_rows`` then
    traces as the plain gather and XLA's spec-driven transpose (scatter-add
    + boundary psum) applies — the round-4 behavior, verified equal to
    single-device grads in tests/test_dist.py.  Single-chip fit paths keep
    the segment-sum transpose (the perf-critical case).
    """
    global _SEGSUM_TRANSPOSE
    old = _SEGSUM_TRANSPOSE
    _SEGSUM_TRANSPOSE = False
    try:
        yield
    finally:
        _SEGSUM_TRANSPOSE = old


def take_rows(table, idx):
    """``table[idx]`` (table [M,C], idx int [...]) whose TRANSPOSE
    accumulates duplicate rows via sort+segment-sum instead of XLA's
    scatter-add (see above).  Forward is the plain gather.  Inside
    ``plain_gather_transpose()`` (shard_map'd grad paths) it traces as the
    plain gather instead."""
    if not _SEGSUM_TRANSPOSE:
        return jnp.take(table, idx, axis=0)
    return _take_rows_impl(table, idx, table.shape[0], str(table.dtype))


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _take_rows_impl(table, idx, nrows, dtype_str):
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx, nrows, dtype_str):
    return jnp.take(table, idx, axis=0), idx


def _take_rows_bwd(nrows, dtype_str, idx, g):
    c = g.shape[-1]
    # accumulate in f32 (bf16 tables would otherwise accumulate cotangents
    # at bf16 — the segment-sum runs full precision, cast once at the end)
    ct = _segsum_transpose(idx.reshape(-1),
                           g.reshape(-1, c).astype(jnp.float32), nrows)
    return ct.astype(dtype_str), None


_take_rows_impl.defvjp(_take_rows_fwd, _take_rows_bwd)


def cubic_coefficients(v, a1, b1):
    """Cubic coefficients (A,B,C,D) from 8 corner values and the segment.

    ``a1`` is the cell-space entry point, ``b1`` the cell-space segment
    vector (exit - entry); both [R,3]; ``v`` is [R,8].  Mirrors
    ``GetDensityPolynomial`` with the corner-wise products vectorized.
    """
    off = CORNERS[None, :, :]                # [1,8,3]
    # ax, bx: [R,8,3] — per corner per axis the selected a / b factor.
    ax = jnp.where(off == 1, a1[:, None, :], (1.0 - a1)[:, None, :])
    bx = jnp.where(off == 1, b1[:, None, :], (-b1)[:, None, :])
    pa = jnp.prod(ax, axis=-1)  # [R,8]
    pb = jnp.prod(bx, axis=-1)  # [R,8]

    def loo(src):  # [R,8,3] -> [R,8,3] leave-one-out products over axes
        x, y, z = src[..., 0], src[..., 1], src[..., 2]
        return jnp.stack([y * z, x * z, x * y], axis=-1)

    wB = jnp.sum(ax * loo(bx), axis=-1)  # sum_j a_j prod_{k!=j} b_k
    wC = jnp.sum(bx * loo(ax), axis=-1)  # sum_j b_j prod_{k!=j} a_k
    A = jnp.sum(pb * v, axis=-1)
    B = jnp.sum(wB * v, axis=-1)
    C = jnp.sum(wC * v, axis=-1)
    D = jnp.sum(pa * v, axis=-1)
    return A, B, C, D


def eval_cubic(t, A, B, C, D):
    return ((A * t + B) * t + C) * t + D


def surface_intersection(A, B, C, D, t_in, t_out):
    """Root isolation + refinement on the cubic; returns (hit, t_hit).

    Reproduces ``GetSurfaceIntersectionT`` branch-for-branch with lanewise
    selects: clamp the bracket start to the ray origin, immediate hit if the
    density at the start is <= 0, shrink the bracket at the cubic's extrema
    (quadratic roots of the derivative), reject when no sign change, then two
    regula-falsi steps and a final secant, with the root mapped back through
    lerp(t_in, t_out, tau).
    """
    t0 = jnp.maximum(0.0, -t_in / (t_out - t_in))
    t1 = jnp.ones_like(t0)
    f0 = eval_cubic(t0, A, B, C, D)

    immediate = jnp.sign(f0) <= 0  # density at entry already inside

    f1 = eval_cubic(t1, A, B, C, D)

    dA = 3.0 * A
    dB = 2.0 * B
    disc = dB * dB - 4.0 * dA * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe = (disc >= 0.0) & (dA != 0.0)
    denom = jnp.where(dA != 0.0, 2.0 * dA, 1.0)
    ex1 = jnp.where(safe, (-dB + sq) / denom, jnp.inf)
    ex2 = jnp.where(safe, (-dB - sq) / denom, jnp.inf)
    lo = jnp.minimum(ex1, ex2)
    hi = jnp.maximum(ex1, ex2)

    def bracket_update(ex, t0, f0, t1, f1):
        inside = (ex >= t0) & (ex <= t1)
        fe = eval_cubic(ex, A, B, C, D)
        same = jnp.sign(fe) == jnp.sign(f0)
        new_t0 = jnp.where(inside & same, ex, t0)
        new_f0 = jnp.where(inside & same, fe, f0)
        new_t1 = jnp.where(inside & ~same, ex, t1)
        new_f1 = jnp.where(inside & ~same, fe, f1)
        return new_t0, new_f0, new_t1, new_f1

    t0, f0, t1, f1 = bracket_update(lo, t0, f0, t1, f1)
    t0, f0, t1, f1 = bracket_update(hi, t0, f0, t1, f1)

    no_hit = jnp.sign(f0) == jnp.sign(f1)

    for _ in range(2):  # regula falsi (SH/Include/Voxel.hlsli:760-775)
        t = t0 + (t1 - t0) * (-f0 / (f1 - f0))
        f = eval_cubic(t, A, B, C, D)
        same = jnp.sign(f) == jnp.sign(f0)
        t0 = jnp.where(same, t, t0)
        f0 = jnp.where(same, f, f0)
        t1 = jnp.where(~same, t, t1)
        f1 = jnp.where(~same, f, f1)

    tau = t0 + (t1 - t0) * (-f0 / (f1 - f0))
    t_root = t_in + (t_out - t_in) * tau

    t_hit = jnp.where(immediate, t_in, t_root)
    hit = jnp.where(immediate, True, (~no_hit) & (t_hit > 0))
    return hit, t_hit


def trilinear_rows(v, p):
    """Trilinear interpolation from precomputed corner rows ``v`` [...,8]
    at cell-space position ``p`` [...,3].  Uses the reference's
    ``abs((1-i) - p)`` weight form (``GetDensity``), which extrapolates
    symmetrically when p leaves [0,1] — behavior the normal estimation
    relies on near cell borders."""
    w = jnp.abs((1.0 - CORNERS) - p[..., None, :])  # [...,8,3]
    return jnp.sum(jnp.prod(w, axis=-1) * v, axis=-1)


def trilinear_density(cfetch, cell, p):
    """Trilinear SDF sample at cell-space position ``p`` [R,3] of ``cell``;
    ``cfetch(cell) -> [R,8]`` supplies the corner values (packed-layout or
    voxel-gather backed)."""
    return trilinear_rows(cfetch(cell), p)


# offsets for the central-difference neighborhood, in the row order
# ``resolve_hits`` batches: +x, -x, +y, -y, +z, -z
NEIGHBOR_OFFSETS = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                             [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.int32)


def central_difference_normal_rows(rows6, p):
    """``central_difference_normal`` from precomputed neighbor corner rows
    ``rows6`` [...,6,8] (NEIGHBOR_OFFSETS order) — the 6 cell fetches are
    batched by the caller into ONE gather (resolve's single 7-cell fetch),
    so their transpose is one segment-summed accumulation instead of six
    scatter-adds."""
    gx = trilinear_rows(rows6[..., 0, :], p) - trilinear_rows(
        rows6[..., 1, :], p)
    gy = trilinear_rows(rows6[..., 2, :], p) - trilinear_rows(
        rows6[..., 3, :], p)
    gz = trilinear_rows(rows6[..., 4, :], p) - trilinear_rows(
        rows6[..., 5, :], p)
    g = jnp.stack([gx, gy, gz], axis=-1)
    n2 = jnp.sum(g * g, axis=-1, keepdims=True)
    good = (n2 > 0) & jnp.isfinite(n2)
    unit = g / jnp.sqrt(jnp.where(good, n2, 1.0))
    return jnp.where(good, unit, 0.0)


def central_difference_normal(cfetch, cell, p):
    """Central-difference normal at cell-space position p of ``cell``.

    Samples the trilinear field at the 6 neighbor cells with the *same*
    fractional position (``GetNormal``, ``SH/Include/Voxel.hlsli:783-804``);
    NaN results collapse to the zero vector as in the reference.
    """
    ex = jnp.array([1, 0, 0], jnp.int32)
    ey = jnp.array([0, 1, 0], jnp.int32)
    ez = jnp.array([0, 0, 1], jnp.int32)
    gx = trilinear_density(cfetch, cell + ex, p) - trilinear_density(cfetch, cell - ex, p)
    gy = trilinear_density(cfetch, cell + ey, p) - trilinear_density(cfetch, cell - ey, p)
    gz = trilinear_density(cfetch, cell + ez, p) - trilinear_density(cfetch, cell - ez, p)
    g = jnp.stack([gx, gy, gz], axis=-1)
    # gradient-safe normalize: the reference maps NaN results to zero
    # (Voxel.hlsli:794-799); a zero gradient vector normalizes to NaN in
    # HLSL and therefore also maps to zero.
    n2 = jnp.sum(g * g, axis=-1, keepdims=True)
    good = (n2 > 0) & jnp.isfinite(n2)
    unit = g / jnp.sqrt(jnp.where(good, n2, 1.0))
    return jnp.where(good, unit, 0.0)
