"""Texture sampling: bilinear-wrap 2D, triplanar projection, cubemaps.

TPU equivalents of the DX samplers used by the shaders:

- geometry textures: linear filter + wrap addressing, sampled through the
  object-space triplanar projection of ``TriSampleTexture`` /
  ``TriSampleNormal`` (``SH/Include/Textures.hlsli``),
- environment: cube map sampled with the direction swizzled ``.xzy``
  (``SH/Raytracing.hlsl:444-449``), D3D face/uv conventions, bilinear
  within the selected face (face seams clamp rather than blend across
  faces — a visually negligible deviation noted for the golden tests).

Textures live in one stacked array [T, TH, TW, 3] padded to the largest
resolution with per-texture actual sizes, so a dispatch samples any texture
with a single gather pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from vrt.core import quat as vq


def sample_bilinear_wrap(textures, sizes, tex_id, uv):
    """textures [T,TH,TW,3], sizes i32 [T,2] (h,w), tex_id i32 [R], uv [R,2].

    D3D linear+wrap: texel centers at (i+0.5)/N; uv wraps with frac.
    """
    hw = sizes[tex_id].astype(jnp.float32)          # [R,2] (h, w)
    h, w = hw[..., 0], hw[..., 1]
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def tap(ui, vi):
        uw = jnp.mod(ui.astype(jnp.int32), w.astype(jnp.int32))
        vw = jnp.mod(vi.astype(jnp.int32), h.astype(jnp.int32))
        return textures[tex_id, vw, uw]

    c00 = tap(u0, v0)
    c10 = tap(u0 + 1, v0)
    c01 = tap(u0, v0 + 1)
    c11 = tap(u0 + 1, v0 + 1)
    top = c00 * (1 - fu) + c10 * fu
    bot = c01 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


def _triplanar_uvs(obj_pos, scale):
    """uvX = zy/scale, uvY = xz/scale, uvZ = xy/scale (Textures.hlsli:20-22)."""
    s = scale
    uv_x = jnp.stack([obj_pos[..., 2], obj_pos[..., 1]], -1) / s
    uv_y = jnp.stack([obj_pos[..., 0], obj_pos[..., 2]], -1) / s
    uv_z = jnp.stack([obj_pos[..., 0], obj_pos[..., 1]], -1) / s
    return uv_x, uv_y, uv_z


def _blend_weights(normal):
    b = jnp.abs(normal)
    s = jnp.sum(b, axis=-1, keepdims=True)
    ok = s > 0
    return jnp.where(ok, b / jnp.where(ok, s, 1.0), 0.0)


def tri_sample(textures, sizes, tex_id, scale, obj_pos, normal):
    """``TriSampleTexture``: triplanar blend of three axis projections."""
    uv_x, uv_y, uv_z = _triplanar_uvs(obj_pos, scale)
    tx = sample_bilinear_wrap(textures, sizes, tex_id, uv_x)
    ty = sample_bilinear_wrap(textures, sizes, tex_id, uv_y)
    tz = sample_bilinear_wrap(textures, sizes, tex_id, uv_z)
    b = _blend_weights(normal)
    return (tx * b[..., 0:1] + ty * b[..., 1:2] + tz * b[..., 2:3])


def _quat_from_x(v):
    """``fromX`` (SH/Include/Quaternion.hlsli): rotation from +X to v."""
    return vq.from_two_vectors(jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0]), v.shape), v)


def tri_sample_normal(textures, sizes, tex_id, scale, obj_pos, normal):
    """``TriSampleNormal``: triplanar tangent normal, swizzled .zxy, rotated
    by the +X-to-surface-normal quaternion (Textures.hlsli:36-58)."""
    uv_x, uv_y, uv_z = _triplanar_uvs(obj_pos, scale)
    tx = sample_bilinear_wrap(textures, sizes, tex_id, uv_x) * 2.0 - 1.0
    ty = sample_bilinear_wrap(textures, sizes, tex_id, uv_y) * 2.0 - 1.0
    tz = sample_bilinear_wrap(textures, sizes, tex_id, uv_z) * 2.0 - 1.0
    b = _blend_weights(normal)
    t = tx * b[..., 0:1] + ty * b[..., 1:2] + tz * b[..., 2:3]
    n2 = jnp.sum(t * t, axis=-1, keepdims=True)
    ok = n2 > 0
    t = jnp.where(ok, t / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    t = t[..., jnp.array([2, 0, 1])]  # .zxy
    q = _quat_from_x(normal)
    return vq.rotate(q, t)


# ---------------------------------------------------------------------------
# Cube maps
# ---------------------------------------------------------------------------

def sample_cube(env, direction):
    """Sample a cube map [6,E,E,3] with D3D face conventions, bilinear.

    Face order +X,-X,+Y,-Y,+Z,-Z.  The caller applies the reference's
    ``.xzy`` swizzle before calling.
    """
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    x_major = (ax >= ay) & (ax >= az)
    y_major = (~x_major) & (ay >= az)

    ma = jnp.where(x_major, ax, jnp.where(y_major, ay, az))
    face = jnp.where(
        x_major, jnp.where(x >= 0, 0, 1),
        jnp.where(y_major, jnp.where(y >= 0, 2, 3),
                  jnp.where(z >= 0, 4, 5)))
    sc = jnp.where(x_major, jnp.where(x >= 0, -z, z),
                   jnp.where(y_major, x, jnp.where(z >= 0, x, -x)))
    tc = jnp.where(x_major, -y,
                   jnp.where(y_major, jnp.where(y >= 0, z, -z), -y))

    e = env.shape[1]
    u = ((sc / ma) + 1.0) * 0.5 * e - 0.5
    v = ((tc / ma) + 1.0) * 0.5 * e - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def tap(ui, vi):
        uc = jnp.clip(ui.astype(jnp.int32), 0, e - 1)
        vc = jnp.clip(vi.astype(jnp.int32), 0, e - 1)
        return env[face, vc, uc]

    c00 = tap(u0, v0)
    c10 = tap(u0 + 1, v0)
    c01 = tap(u0, v0 + 1)
    c11 = tap(u0 + 1, v0 + 1)
    top = c00 * (1 - fu) + c10 * fu
    bot = c01 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


def sample_env(env, world_dir):
    """Miss-shader env lookup: direction swizzled .xzy
    (``SH/Raytracing.hlsl:444-449``)."""
    swz = world_dir[..., jnp.array([0, 2, 1])]
    return sample_cube(env, swz)
