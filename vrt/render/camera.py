"""Camera ray generation.

Reproduces ``GenerateCameraRay`` (``SH/Include/Ray.hlsli:36-48``) composed
with the host-side RH look-to view and RH perspective matrices
(``VR/Renderer/DX/Private/RDXScene.cpp:703-724``), algebraically collapsed:

    screen   s = ((px,py) + 0.5) / (W,H) * 2 - 1
    target   = (s.x / xScale, -s.y / yScale, -1)        [row-vector ProjInv]
    dir      = target.x * xaxis + target.y * yaxis + target.z * zaxis
             = forward + (s.x/xScale) * xaxis - (s.y/yScale) * yaxis

with xScale = cot(fov/2)/aspect, yScale = cot(fov/2) (XMMatrixPerspectiveFovRH)
and the camera basis of XMMatrixLookToRH: zaxis = -normalize(forward),
xaxis = normalize(cross(up, zaxis)), yaxis = cross(zaxis, xaxis).

Ray directions are deliberately **not normalized**, matching the reference —
all march t-biases (0.01 / 0.1) are in these t units.
"""

from __future__ import annotations

import jax.numpy as jnp

from vrt.core import quat as vq


def camera_basis(cam_rot):
    fwd = vq.forward_vector(cam_rot)
    up = vq.up_vector(cam_rot)
    zaxis = -fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    xaxis = jnp.cross(up, zaxis)
    xaxis = xaxis / jnp.linalg.norm(xaxis, axis=-1, keepdims=True)
    yaxis = jnp.cross(zaxis, xaxis)
    return xaxis, yaxis, zaxis


def camera_rays(cam_pos, cam_rot, fov_y_deg, width: int, height: int):
    """-> (origins [H*W,3], directions [H*W,3]), row-major pixel order."""
    aspect = width / height
    y_scale = 1.0 / jnp.tan(jnp.deg2rad(fov_y_deg) * 0.5)
    x_scale = y_scale / aspect

    xaxis, yaxis, zaxis = camera_basis(cam_rot)

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    sx, sy = jnp.meshgrid(px, py, indexing="xy")  # [H,W]

    d = (sx[..., None] / x_scale) * xaxis \
        + (-sy[..., None] / y_scale) * yaxis \
        - zaxis
    d = d.reshape(-1, 3)
    o = jnp.broadcast_to(cam_pos, d.shape)
    return o, d
