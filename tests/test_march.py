"""March vs analytic solutions and vs the independent NumPy re-derivation."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests import numpy_reference as ref
from vrt.march.march import march_volume, ray_aabb
from vrt.march.resolve import resolve_volume_hits
from vrt.march.types import (DeviceVolume, KIND_CUBE, KIND_SOLID_ENTRY,
                             KIND_SURFACE)
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def _sphere_volume(resolution=5, extends=100.0, radius=50.0):
    return VoxelVolume.from_generator(S.Sphere(radius=radius), resolution,
                                      extends)


def _march(vol, o, d, t_max=1e4, interp=True):
    dv = DeviceVolume.from_volume(vol)
    o = jnp.asarray(np.atleast_2d(o).astype(np.float32))
    d = jnp.asarray(np.atleast_2d(d).astype(np.float32))
    tm = jnp.full(o.shape[0], t_max, jnp.float32)
    hit = march_volume(dv, o, d, tm, interp=interp)
    t, normal, unlit = resolve_volume_hits(dv, o, d, hit)
    return hit, np.asarray(t), np.asarray(normal)


class TestRayAABB:
    def test_basic(self):
        o = jnp.asarray([[-10.0, 0, 0]])
        d = jnp.asarray([[1.0, 0, 0]])
        ok, te, tx = ray_aabb(o, d, -5.0, 5.0, jnp.asarray([100.0]))
        assert bool(ok[0])
        assert float(te[0]) == pytest.approx(5.0)
        assert float(tx[0]) == pytest.approx(15.0)

    def test_zero_direction_axis(self):
        # grazing with a zero direction component inside the slab
        o = jnp.asarray([[-10.0, 1.0, 0]])
        d = jnp.asarray([[1.0, 0.0, 0]])
        ok, te, tx = ray_aabb(o, d, -5.0, 5.0, jnp.asarray([100.0]))
        assert bool(ok[0])
        # outside the slab on a zero axis -> miss
        o2 = jnp.asarray([[-10.0, 9.0, 0]])
        ok2, _, _ = ray_aabb(o2, d, -5.0, 5.0, jnp.asarray([100.0]))
        assert not bool(ok2[0])

    def test_miss(self):
        o = jnp.asarray([[-10.0, 20.0, 0]])
        d = jnp.asarray([[1.0, 0, 0]])
        ok, _, _ = ray_aabb(o, d, -5.0, 5.0, jnp.asarray([100.0]))
        assert not bool(ok[0])


class TestSphereMarch:
    def test_head_on_hit(self):
        vol = _sphere_volume()
        hit, t, n = _march(vol, [-300.0, 0, 0], [1.0, 0, 0])
        assert bool(hit.hit[0])
        assert int(hit.kind[0]) == KIND_SURFACE
        # analytic hit at t=250; grid discretization keeps it within a voxel
        assert t[0] == pytest.approx(250.0, abs=vol.cell_size)
        assert np.allclose(n[0], [-1, 0, 0], atol=0.02)

    def test_miss(self):
        vol = _sphere_volume()
        hit, t, _ = _march(vol, [-300.0, 80.0, 0], [1.0, 0, 0])
        assert not bool(hit.hit[0])
        assert t[0] == np.inf

    def test_origin_inside_solid_is_pass_through(self):
        # reference quirk: ReportHit(tEnter<0) is rejected and the shader
        # returns -> a camera inside a fully solid cell sees through it
        vol = _sphere_volume()
        hit, _, _ = _march(vol, [0.0, 0, 0], [1.0, 0, 0])
        assert not bool(hit.hit[0])

    def test_solid_entry_from_outside(self):
        # big sphere fills the whole volume -> entry cell fully solid
        vol = _sphere_volume(radius=400.0)
        hit, t, n = _march(vol, [-300.0, 0, 0], [1.0, 0, 0])
        assert bool(hit.hit[0])
        assert int(hit.kind[0]) == KIND_SOLID_ENTRY
        assert t[0] == pytest.approx(200.01, abs=1e-3)
        assert np.allclose(n[0], [-1, 0, 0], atol=1e-6)

    def test_cube_mode(self):
        vol = _sphere_volume()
        hit, t, n = _march(vol, [-300.0, 0, 0], [1.0, 0, 0], interp=False)
        assert bool(hit.hit[0])
        assert int(hit.kind[0]) == KIND_CUBE
        # voxel-stepped hit lies within a cell of the analytic surface
        assert abs(t[0] - 250.0) < 2 * vol.cell_size
        assert np.allclose(n[0], [-1, 0, 0], atol=1e-6)

    def test_normals_point_outward(self):
        vol = _sphere_volume(resolution=6)
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        o = (-dirs * 300.0).astype(np.float32)
        hit, t, n = _march(vol, o, dirs)
        hits = np.asarray(hit.hit)
        assert hits.all()
        p = o + t[:, None] * dirs
        outward = p / np.linalg.norm(p, axis=1, keepdims=True)
        dots = np.sum(n * outward, axis=1)
        assert np.all(dots > 0.98)


class TestGoldenVsNumpyReference:
    """Cross-check against the independent scalar re-derivation."""

    def _compare(self, vol, rays_o, rays_d, interp=True):
        dv = DeviceVolume.from_volume(vol)
        o = jnp.asarray(rays_o)
        d = jnp.asarray(rays_d)
        tm = jnp.full(o.shape[0], 1e4, jnp.float32)
        hit = march_volume(dv, o, d, tm, interp=interp)
        t, normal, _ = resolve_volume_hits(dv, o, d, hit)

        rvol = ref.Volume(vol.sdf, vol.resolution, vol.extends)
        for i in range(rays_o.shape[0]):
            expect = ref.intersect_volume(rvol, rays_o[i].astype(np.float64),
                                          rays_d[i].astype(np.float64))
            got_hit = bool(hit.hit[i])
            if expect is None:
                assert not got_hit, f"ray {i}: unexpected hit"
            else:
                assert got_hit, f"ray {i}: missing hit ({expect['kind']})"
                assert float(t[i]) == pytest.approx(expect["t"], rel=2e-3,
                                                    abs=2e-3), f"ray {i}"
                if expect["kind"] == "surface":
                    assert np.allclose(np.asarray(normal[i]),
                                       expect["normal"], atol=5e-3), f"ray {i}"

    def test_sphere_fan(self):
        vol = _sphere_volume(resolution=4)
        ang = np.linspace(-0.5, 0.5, 13)
        rays_d = np.stack([np.ones_like(ang), np.sin(ang),
                           0.3 * np.cos(3 * ang)], 1).astype(np.float32)
        rays_o = np.tile(np.array([[-280.0, 5.0, -3.0]], np.float32),
                         (len(ang), 1))
        self._compare(vol, rays_o, rays_d)

    def test_random_volume_random_rays(self):
        rng = np.random.default_rng(42)
        r = 3
        n = (1 << r) + 1
        # smooth-ish random SDF with surfaces
        base = rng.normal(size=(n, n, n)).astype(np.float32)
        from scipy.ndimage import gaussian_filter
        sdf = gaussian_filter(base, 1.2).astype(np.float32) * 10.0
        vol = VoxelVolume(r, 20.0, sdf=sdf)
        rays_o = rng.uniform(-60, 60, size=(40, 3)).astype(np.float32)
        target = rng.uniform(-15, 15, size=(40, 3)).astype(np.float32)
        rays_d = (target - rays_o)
        rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
        rays_d = rays_d.astype(np.float32)
        self._compare(vol, rays_o, rays_d)

    def test_origin_inside_volume(self):
        vol = _sphere_volume(resolution=4)
        rng = np.random.default_rng(1)
        rays_o = rng.uniform(-90, 90, size=(20, 3)).astype(np.float32)
        rays_d = rng.normal(size=(20, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
        self._compare(vol, rays_o, rays_d)


class TestChebyshevAccel:
    """The distance-map skip mode must produce the same hits."""

    def test_hits_match_octree_mode(self):
        from scipy.ndimage import gaussian_filter
        rng = np.random.default_rng(11)
        r = 4
        n = (1 << r) + 1
        sdf = gaussian_filter(rng.normal(size=(n, n, n)), 1.3).astype(
            np.float32) * 12.0
        vol = VoxelVolume(r, 40.0, sdf=sdf)
        dv_oct = DeviceVolume.from_volume(vol)
        dv_che = DeviceVolume.from_volume(vol, accel_mode="chebyshev")

        dirs = rng.normal(size=(200, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        o = jnp.asarray(-dirs * 120.0
                        + rng.normal(scale=25, size=(200, 3)).astype(np.float32))
        d = jnp.asarray(dirs)
        tm = jnp.full(200, 1e4, jnp.float32)

        h1 = march_volume(dv_oct, o, d, tm)
        h2 = march_volume(dv_che, o, d, tm)
        agree = np.asarray(h1.hit) == np.asarray(h2.hit)
        assert agree.mean() > 0.995, agree.mean()
        both = np.asarray(h1.hit) & np.asarray(h2.hit)
        np.testing.assert_allclose(np.asarray(h1.t)[both],
                                   np.asarray(h2.t)[both], atol=1e-2,
                                   rtol=1e-4)
        same_cell = np.all(np.asarray(h1.cell)[both]
                           == np.asarray(h2.cell)[both], axis=1)
        assert same_cell.mean() > 0.99


class TestCubeGoldenVsNumpyReference:
    def test_cube_random_rays(self):
        from scipy.ndimage import gaussian_filter
        rng = np.random.default_rng(9)
        r = 3
        n = (1 << r) + 1
        sdf = gaussian_filter(rng.normal(size=(n, n, n)), 1.1).astype(
            np.float32) * 8.0
        vol = VoxelVolume(r, 20.0, sdf=sdf)
        dv = DeviceVolume.from_volume(vol)

        rays_o = rng.uniform(-60, 60, size=(40, 3)).astype(np.float32)
        target = rng.uniform(-12, 12, size=(40, 3)).astype(np.float32)
        rays_d = target - rays_o
        rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
        rays_d = rays_d.astype(np.float32)

        hit = march_volume(dv, jnp.asarray(rays_o), jnp.asarray(rays_d),
                           jnp.full(40, 1e4, jnp.float32), interp=False)
        from vrt.march.resolve import resolve_volume_hits
        t, normal, _ = resolve_volume_hits(dv, jnp.asarray(rays_o),
                                           jnp.asarray(rays_d), hit)

        rvol = ref.Volume(vol.sdf, vol.resolution, vol.extends)
        for i in range(40):
            expect = ref.intersect_volume_cube(
                rvol, rays_o[i].astype(np.float64),
                rays_d[i].astype(np.float64))
            got = bool(hit.hit[i])
            if expect is None:
                assert not got, f"ray {i}"
            else:
                assert got, f"ray {i}"
                assert float(t[i]) == pytest.approx(expect["t"], rel=2e-3,
                                                    abs=2e-3), f"ray {i}"
                if expect["kind"] == "cube":
                    assert tuple(np.asarray(hit.cell[i])) == expect["cell"], i
                    assert np.allclose(np.asarray(normal[i]),
                                       expect["normal"], atol=1e-5), f"ray {i}"
