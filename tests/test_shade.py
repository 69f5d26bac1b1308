"""Shading units: BRDF formulas, lights, textures, cubemaps, tonemap."""

import jax.numpy as jnp
import numpy as np
import pytest

from vrt.shade import brdf as B
from vrt.shade import lights as L
from vrt.shade import texture as T
from vrt.render.renderer import tonemap


def _n(*v):
    a = np.asarray(v, np.float32)
    return a / np.linalg.norm(a)


class TestBRDF:
    def test_distribution_peak_at_normal(self):
        n = jnp.asarray([_n(0, 0, 1)])
        d_aligned = B.distribution_ggx(n, jnp.asarray([_n(0, 0, 1)]),
                                       jnp.asarray([0.5]))
        d_off = B.distribution_ggx(n, jnp.asarray([_n(1, 0, 1)]),
                                   jnp.asarray([0.5]))
        assert float(d_aligned[0]) > float(d_off[0])

    def test_distribution_formula(self):
        # D = a^2 / max(pi c^2, 1e-3), c = (n.h)^2 (a^2-1) + 1
        a = 0.3
        ndoth = 0.8
        c = ndoth * ndoth * (a * a - 1) + 1
        expect = a * a / max(B.PI * c * c, 0.001)
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        h = jnp.asarray([[np.sqrt(1 - ndoth ** 2), 0.0, ndoth]])
        got = float(B.distribution_ggx(n, h, jnp.asarray([a]))[0])
        assert got == pytest.approx(expect, rel=1e-5)

    def test_fresnel_limits(self):
        f0 = jnp.asarray([[0.04, 0.04, 0.04]])
        wo = jnp.asarray([[0.0, 0.0, 1.0]])
        # head-on: F = f0
        assert np.allclose(B.fresnel_schlick(f0, wo, wo), 0.04, atol=1e-6)
        # grazing: F -> 1
        h = jnp.asarray([[1.0, 0.0, 0.0]])
        assert np.allclose(B.fresnel_schlick(f0, wo, h), 1.0, atol=1e-6)

    def test_radiance_unclamped_nwi(self):
        # the reference multiplies by dot(n, wi) WITHOUT clamping
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        wi = jnp.asarray([_n(0.4, 0.0, -1.0)])  # light below the horizon
        wo = jnp.asarray([[0.0, 0.0, 1.0]])
        alb = jnp.asarray([[0.5, 0.5, 0.5]])
        r = B.radiance(jnp.asarray([[1.0, 1.0, 1.0]]), wi, wo, n, alb,
                       jnp.asarray([0.8]), jnp.asarray([0.0]),
                       jnp.asarray([0.405]))
        assert float(r[0, 0]) < 0.0  # negative radiance leaks through

    def test_energy_rough_lambert_ballpark(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        wi = jnp.asarray([_n(0, 0.3, 1.0)])
        wo = jnp.asarray([_n(0.2, 0, 1.0)])
        alb = jnp.asarray([[0.8, 0.8, 0.8]])
        val = B.brdf(wi, wo, n, alb, jnp.asarray([1.0]), jnp.asarray([0.0]),
                     jnp.asarray([0.5]))
        lambert = 0.8 / B.PI
        assert np.all(np.asarray(val) > 0.3 * lambert)
        assert np.all(np.asarray(val) < 3.0 * lambert)


class TestLights:
    def test_point_attenuation(self):
        # I/(1 + aL d + aE d^2)  (Lighting.hlsli:17-20)
        got = float(L.point_light_intensity(jnp.asarray(100.0),
                                            jnp.asarray(10.0),
                                            jnp.asarray(0.5),
                                            jnp.asarray(0.005)))
        assert got == pytest.approx(100.0 / (1 + 5.0 + 0.5), rel=1e-6)

    def test_spot_cone(self):
        pos = jnp.asarray([[0.0, 0.0, -10.0]])   # below the light
        lp = jnp.zeros((1, 3))
        ldir = jnp.asarray([[0.0, 0.0, -1.0]])
        args = (jnp.asarray([10.0]), jnp.asarray([0.0]), jnp.asarray([0.0]),
                jnp.asarray([np.cos(np.deg2rad(22.5))]),
                jnp.asarray([np.cos(np.deg2rad(10.0))]))
        inside = L.spot_light_intensity(pos, jnp.asarray([10.0]), lp, ldir,
                                        *args)
        assert float(inside[0]) == pytest.approx(10.0, rel=1e-5)
        # outside the cone
        pos2 = jnp.asarray([[10.0, 0.0, -1.0]])
        outside = L.spot_light_intensity(pos2, jnp.asarray([10.05]), lp, ldir,
                                         *args)
        assert float(outside[0]) == 0.0

    def test_spot_falloff_partial(self):
        # between falloff and cone edge the delta ramps linearly
        cos_angle = np.cos(np.deg2rad(22.5))
        cos_falloff = np.cos(np.deg2rad(10.0))
        mid_angle = np.deg2rad(16.0)
        z = -np.cos(mid_angle)
        x = np.sin(mid_angle)
        pos = jnp.asarray([[x * 10, 0.0, z * 10]])
        got = float(L.spot_light_intensity(
            pos, jnp.asarray([10.0]), jnp.zeros((1, 3)),
            jnp.asarray([[0.0, 0.0, -1.0]]), jnp.asarray([1.0]),
            jnp.asarray([0.0]), jnp.asarray([0.0]),
            jnp.asarray([cos_angle]), jnp.asarray([cos_falloff]))[0])
        delta = (np.cos(mid_angle) - cos_angle) / (cos_falloff - cos_angle)
        assert got == pytest.approx(min(delta, 1.0), rel=1e-4)


class TestTextures:
    def test_bilinear_wrap_exact_texel(self):
        tex = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3))
        sizes = jnp.asarray([[2, 2]], jnp.int32)
        # uv at texel center (0.25, 0.25) -> texel (0,0)
        out = T.sample_bilinear_wrap(tex, sizes, jnp.asarray([0]),
                                     jnp.asarray([[0.25, 0.25]]))
        assert np.allclose(out[0], [0, 1, 2], atol=1e-5)

    def test_bilinear_interpolates(self):
        tex = np.zeros((1, 1, 2, 3), np.float32)
        tex[0, 0, 1] = 1.0
        sizes = jnp.asarray([[1, 2]], jnp.int32)
        out = T.sample_bilinear_wrap(jnp.asarray(tex), sizes,
                                     jnp.asarray([0]),
                                     jnp.asarray([[0.5, 0.5]]))
        assert np.allclose(out[0], 0.5, atol=1e-5)

    def test_wrap_addressing(self):
        tex = np.zeros((1, 1, 2, 3), np.float32)
        tex[0, 0, 1] = 1.0
        sizes = jnp.asarray([[1, 2]], jnp.int32)
        a = T.sample_bilinear_wrap(jnp.asarray(tex), sizes, jnp.asarray([0]),
                                   jnp.asarray([[0.25, 0.5]]))
        b = T.sample_bilinear_wrap(jnp.asarray(tex), sizes, jnp.asarray([0]),
                                   jnp.asarray([[1.25, 0.5]]))
        assert np.allclose(a, b, atol=1e-6)

    def test_cubemap_face_selection(self):
        env = np.zeros((6, 2, 2, 3), np.float32)
        for f in range(6):
            env[f] = f / 10.0
        env = jnp.asarray(env)
        dirs = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
        out = np.asarray(T.sample_cube(env, jnp.asarray(dirs)))
        for f in range(6):
            assert out[f, 0] == pytest.approx(f / 10.0, abs=1e-6), f

    def test_env_swizzle(self):
        # sample_env swizzles .xzy: world +Z should land on cube +Y face
        env = np.zeros((6, 2, 2, 3), np.float32)
        env[2] = 1.0  # +Y face
        out = T.sample_env(jnp.asarray(env),
                           jnp.asarray([[0.0, 0.0, 1.0]]))
        assert np.allclose(out[0], 1.0, atol=1e-6)

    def test_triplanar_axis_projection(self):
        # normal along +Z picks the XY projection only
        tex = jnp.asarray(np.random.default_rng(0).uniform(
            size=(1, 4, 4, 3)).astype(np.float32))
        sizes = jnp.asarray([[4, 4]], jnp.int32)
        pos = jnp.asarray([[1.0, 2.0, 3.0]])
        nrm = jnp.asarray([[0.0, 0.0, 1.0]])
        out = T.tri_sample(tex, sizes, jnp.asarray([0]),
                           jnp.asarray([[10.0, 10.0]]), pos, nrm)
        direct = T.sample_bilinear_wrap(tex, sizes, jnp.asarray([0]),
                                        jnp.asarray([[0.1, 0.2]]))
        assert np.allclose(out, direct, atol=1e-6)

    def test_flat_normal_map_returns_geometric_normal(self):
        # default flat normal texture (0.5,0.5,1) must reproduce the
        # surface normal after the .zxy swizzle + fromX rotation
        tex = np.full((1, 1, 1, 3), 0.5, np.float32)
        tex[..., 2] = 1.0
        sizes = jnp.asarray([[1, 1]], jnp.int32)
        rng = np.random.default_rng(3)
        nrm = rng.normal(size=(8, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        out = T.tri_sample_normal(jnp.asarray(tex), sizes,
                                  jnp.zeros(8, jnp.int32),
                                  jnp.asarray([[1.0, 1.0]]),
                                  jnp.asarray(rng.normal(size=(8, 3)),
                                              jnp.float32),
                                  jnp.asarray(nrm))
        assert np.allclose(np.asarray(out), nrm, atol=1e-5)


class TestTonemap:
    def test_values(self):
        x = jnp.asarray([[1.0, 0.0, 3.0]])
        out = np.asarray(tonemap(x))
        assert out[0, 0] == pytest.approx(0.5 ** (1 / 2.2), rel=1e-5)
        assert out[0, 1] == pytest.approx(0.0, abs=1e-6)
        assert out[0, 2] == pytest.approx(0.75 ** (1 / 2.2), rel=1e-5)

    def test_unorm_conversion(self):
        # negative radiance -> NaN through pow -> flushed to 0 like the
        # reference's R8G8B8A8_UNORM render target
        x = jnp.asarray([[-0.5, -2.0, 1e9]])
        out = np.asarray(tonemap(x))
        assert np.isfinite(out).all()
        assert out[0, 0] == 0.0
        assert out[0, 2] <= 1.0
