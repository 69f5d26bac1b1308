"""Cook-Torrance GGX BRDF — exact reproduction of ``SH/Include/Lighting.hlsli``.

Constants from ``SH/Include/Constants.hlsli``: PI = 3.141592 (the reference's
truncated value, kept for bit-parity), SHADOW_BRIGHTNESS = 0,
F0_DIEL = 0.04.  The geometry term's ``k`` is per-material (r+1)^2/8
(``RDXVoxelVolume.cpp:383``).  All functions are elementwise over [R] lanes
with [R,3] vectors; none of the dot products are clamped beyond what the
reference clamps.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592  # Constants.hlsli — deliberately not np.pi
SHADOW_BRIGHTNESS = 0.0
F0_DIEL = 0.04


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def distribution_ggx(n, h, roughness):
    """D (Lighting.hlsli:50-58): a^2 / max(pi*c^2, 1e-3), c = (n.h)^2(a^2-1)+1."""
    a2 = roughness * roughness
    ndoth = jnp.maximum(_dot(n, h), 0.0)
    c = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * c * c, 0.001)


def g_schlick(ndotw, k):
    return ndotw / (ndotw * (1.0 - k) + k)


def g_smith(n, wo, wi, k):
    dwo = jnp.maximum(_dot(n, wo), 0.0)
    dwi = jnp.maximum(_dot(n, wi), 0.0)
    return g_schlick(dwo, k) * g_schlick(dwi, k)


def fresnel_schlick(f0, wo, h):
    wdoth = jnp.maximum(_dot(wo, h), 0.0)
    return f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - wdoth, 0.0), 5.0)[..., None]


def brdf(wi, wo, n, albedo, roughness, metallic, k):
    """Lighting.hlsli:80-96: lambert*kd + cook*F.  The half-vector
    normalize is gradient-safe: wi == -wo maps h to zero instead of NaN."""
    h = wi + wo
    n2 = jnp.sum(h * h, axis=-1, keepdims=True)
    ok = n2 > 0
    h = jnp.where(ok, h / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    f0 = F0_DIEL * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    d = distribution_ggx(n, h, roughness)
    f = fresnel_schlick(f0, wo, h)
    g = g_smith(n, wo, wi, k)
    lambert = albedo / PI
    denom = jnp.maximum(4.0 * jnp.maximum(_dot(wo, n), 0.0)
                        * jnp.maximum(_dot(wi, n), 0.0), 0.0001)
    cook = (d * g / denom)[..., None] * f
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    return lambert * kd + cook * f


def radiance(li, wi, wo, n, albedo, roughness, metallic, k):
    """Lighting.hlsli:98-101 — note n.wi is *unclamped* in the reference."""
    return brdf(wi, wo, n, albedo, roughness, metallic, k) * li * _dot(n, wi)[..., None]
