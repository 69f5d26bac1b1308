"""Quaternion + vector math in the reference engine's conventions.

Coordinate convention (reference ``VR/Core/Private/Vector.cpp:38-46``):
Z-up, X-forward, Y-right:

    UP      = (0, 0, 1)
    FORWARD = (1, 0, 0)
    RIGHT   = (0, 1, 0)

Quaternions are stored ``(x, y, z, w)`` (Eigen/Hamilton convention, matching
``VR/Core/Private/Quat.cpp``).  All functions work on batched ``[..., 4]`` /
``[..., 3]`` arrays and dispatch between numpy and jax.numpy based on their
inputs: host-side scene assembly stays pure numpy (no per-op device
compiles), while the same code traces under jit for device-side use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

UP = np.array([0.0, 0.0, 1.0], np.float32)
FORWARD = np.array([1.0, 0.0, 0.0], np.float32)
RIGHT = np.array([0.0, 1.0, 0.0], np.float32)

IDENTITY = np.array([0.0, 0.0, 0.0, 1.0], np.float32)


def _xp(*arrays):
    """numpy for host data, jax.numpy for device arrays/tracers."""
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def normalize(v, eps=0.0):
    """Normalize the last axis. eps=0 matches HLSL normalize (inf/nan on zero)."""
    xp = _xp(v)
    n = xp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = xp.maximum(n, eps)
    return v / n


def dot(a, b):
    return (a * b).sum(-1)


def cross(a, b):
    return _xp(a, b).cross(a, b)


def from_axis_angle(axis, angle):
    """Quaternion from (unit) axis and angle in radians.

    Matches ``VQuat::FromAxisAngle`` (Eigen AngleAxis,
    ``VR/Core/Private/Quat.cpp:36-41``).
    """
    xp = _xp(axis, angle)
    axis = xp.asarray(axis, dtype=np.float32)
    angle = xp.asarray(angle, dtype=np.float32)
    half = angle * 0.5
    s = xp.sin(half)[..., None]
    w = xp.cos(half)[..., None]
    return xp.concatenate([axis * s, w], axis=-1)


def multiply(q1, q2):
    """Hamilton product q1*q2 (apply q2 first, then q1)."""
    xp = _xp(q1, q2)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return xp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conjugate(q):
    xp = _xp(q)
    return q * xp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inverse(q):
    return conjugate(q) / (q * q).sum(-1, keepdims=True)


def rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q. Batched on leading dims."""
    xp = _xp(q, v)
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * xp.cross(qv, v)
    return v + qw * t + xp.cross(qv, t)


def from_euler_degrees(roll, yaw, pitch):
    """``VQuat::FromEulerAnglesDegrees`` (``VR/Core/Private/Quat.cpp:73-81``):

    FromAxisAngle(RIGHT, pitch) * FromAxisAngle(UP, yaw) * FromAxisAngle(FORWARD, roll)
    """
    xp = _xp(roll, yaw, pitch)
    r = xp.deg2rad(np.float32(roll) if xp is np else roll)
    y = xp.deg2rad(np.float32(yaw) if xp is np else yaw)
    p = xp.deg2rad(np.float32(pitch) if xp is np else pitch)
    qp = from_axis_angle(RIGHT if xp is np else jnp.asarray(RIGHT), p)
    qy = from_axis_angle(UP if xp is np else jnp.asarray(UP), y)
    qr = from_axis_angle(FORWARD if xp is np else jnp.asarray(FORWARD), r)
    return multiply(multiply(qp, qy), qr)


def from_two_vectors(v1, v2):
    """Rotation taking unit v1 to unit v2 (Eigen FromTwoVectors semantics)."""
    xp = _xp(v1, v2)
    v1 = xp.asarray(v1, dtype=np.float32)
    v2 = xp.asarray(v2, dtype=np.float32)
    c = xp.cross(v1, v2)
    d = (v1 * v2).sum(-1)
    w = 1.0 + d
    q = xp.concatenate([c, xp.reshape(w, xp.shape(w) + (1,))], axis=-1)
    # Antiparallel fallback: rotate 180 deg about any axis orthogonal to v1.
    ortho = xp.cross(v1, xp.asarray(RIGHT, dtype=np.float32))
    small = xp.linalg.norm(ortho, axis=-1, keepdims=True) < 1e-6
    ortho = xp.where(small, xp.cross(v1, xp.asarray(UP, dtype=np.float32)),
                     ortho)
    zeros = xp.zeros(xp.shape(w) + (1,), dtype=np.float32)
    flip = xp.concatenate([normalize(ortho, 1e-12), zeros], axis=-1)
    anti = xp.reshape(w, xp.shape(w) + (1,)) < 1e-6
    q = xp.where(anti, flip, q)
    return normalize(q, 1e-12)


def forward_vector(q):
    """Rotation's forward vector (``VQuat::GetForwardVector``)."""
    xp = _xp(q)
    return rotate(q, xp.asarray(FORWARD, dtype=np.float32))


def up_vector(q):
    xp = _xp(q)
    return rotate(q, xp.asarray(UP, dtype=np.float32))


def right_vector(q):
    xp = _xp(q)
    return rotate(q, xp.asarray(RIGHT, dtype=np.float32))
