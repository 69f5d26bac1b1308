"""Volume data model, SDF generators, accel fields."""

import numpy as np
import pytest

from vrt.core.grid import DEFAULT_DENSITY, GridLaw
from vrt.volume import sdf as S
from vrt.volume.accel import (build_accel, build_skip_level,
                              cell_corner_signs_differ, unpack_accel)
from vrt.volume.volume import VoxelVolume


class TestSDFShapes:
    def test_sphere(self):
        s = S.Sphere(radius=2.0)
        p = np.array([[3.0, 0, 0], [0, 0, 0], [0, 2.0, 0]], np.float32)
        d = np.asarray(s.evaluate(p))
        assert np.allclose(d, [1.0, -2.0, 0.0], atol=1e-6)

    def test_box(self):
        b = S.Box(extends=(1.0, 2.0, 3.0))
        assert np.asarray(b.evaluate(np.array([3.0, 0, 0], np.float32))) \
            == pytest.approx(2.0)
        assert np.asarray(b.evaluate(np.zeros(3, np.float32))) \
            == pytest.approx(-1.0)

    def test_cylinder(self):
        c = S.Cylinder(radius=1.0, height=2.0)
        # on the lateral surface
        assert np.asarray(c.evaluate(np.array([1.0, 0, 0], np.float32))) \
            == pytest.approx(0.0, abs=1e-6)
        # above the cap
        assert np.asarray(c.evaluate(np.array([0.0, 3.0, 0], np.float32))) \
            == pytest.approx(1.0, abs=1e-6)

    def test_shape_transform(self):
        s = S.Sphere(radius=1.0, position=np.array([5.0, 0, 0], np.float32))
        assert np.asarray(s.evaluate(np.array([5.0, 0, 0], np.float32))) \
            == pytest.approx(-1.0)

    def test_csg_add_subtract(self):
        root = S.CSG(shape=S.Sphere(radius=2.0))
        root.add_child(S.Sphere(radius=1.0,
                                position=np.array([2.0, 0, 0], np.float32)),
                       S.SUBTRACT)
        p = np.array([2.0, 0, 0], np.float32)
        # subtracted region: max(d_sphere, -d_child) = max(0, 1) ... at the
        # child center d_child=-1 -> max(0, 1) = 1 (outside)
        assert np.asarray(root.evaluate(p)) == pytest.approx(1.0)
        # far outside child, inside parent
        p2 = np.array([-1.0, 0, 0], np.float32)
        assert np.asarray(root.evaluate(p2)) == pytest.approx(-1.0)

    def test_bake_matches_pointwise(self):
        law = GridLaw(3, 10.0)
        sph = S.Sphere(radius=5.0)
        d, m = S.bake(sph, law)
        assert d.shape == (9, 9, 9)
        # center voxel (4,4,4) is at origin
        assert d[4, 4, 4] == pytest.approx(-5.0)
        assert m[4, 4, 4] == 1
        # corner voxel at (-10,-10,-10): dist = sqrt(300)-5
        assert d[0, 0, 0] == pytest.approx(np.sqrt(300.0) - 5.0, rel=1e-5)
        assert m[0, 0, 0] == 0


class TestVoxelVolume:
    def test_default_fill(self):
        v = VoxelVolume(3, 10.0)
        assert v.sdf.shape == (9, 9, 9)
        assert np.all(v.sdf == DEFAULT_DENSITY)

    def test_set_get(self):
        v = VoxelVolume(2, 5.0)
        v.set_voxel((1, 2, 3), -1.5, 4)
        assert v.get_voxel((1, 2, 3)) == (-1.5, 4)
        # out-of-range returns the default voxel (VoxelVolume.cpp GetVoxel)
        assert v.get_voxel((99, 0, 0)) == (DEFAULT_DENSITY, 0)

    def test_dirty_flag(self):
        v = VoxelVolume(2, 5.0)
        v.clear_dirty()
        assert not v.dirty
        v.set_voxel((0, 0, 0), -1.0)
        assert v.dirty


class TestAccel:
    def _brute_force_levels(self, sdf, r):
        """Direct reimplementation of the collapsed octree's merge rule."""
        c = (1 << r)
        s = np.sign(sdf)
        has = np.zeros((c, c, c), bool)
        for i in range(c):
            for j in range(c):
                for k in range(c):
                    corners = s[i:i + 2, j:j + 2, k:k + 2].ravel()
                    has[i, j, k] = np.any(corners != corners[0])
        lvl = np.zeros((c, c, c), np.int32)
        for i in range(c):
            for j in range(c):
                for k in range(c):
                    for L in range(r, 0, -1):
                        bi, bj, bk = (i >> L) << L, (j >> L) << L, (k >> L) << L
                        sz = 1 << L
                        if not has[bi:bi + sz, bj:bj + sz, bk:bk + sz].any():
                            lvl[i, j, k] = L
                            break
        return has, lvl

    def test_skip_levels_match_octree_collapse(self):
        rng = np.random.default_rng(7)
        r = 3
        n = (1 << r) + 1
        sdf = rng.normal(size=(n, n, n)).astype(np.float32) + 0.8
        has_ref, lvl_ref = self._brute_force_levels(sdf, r)
        has = np.asarray(cell_corner_signs_differ(sdf))
        lvl = np.asarray(build_skip_level(has, r))
        assert np.array_equal(has, has_ref)
        assert np.array_equal(lvl, lvl_ref)

    def test_packing(self):
        rng = np.random.default_rng(3)
        r = 2
        n = (1 << r) + 1
        sdf = rng.normal(size=(n, n, n)).astype(np.float32)
        accel = build_accel(sdf, r)
        lvl, has = unpack_accel(accel)
        assert np.array_equal(np.asarray(has),
                              np.asarray(cell_corner_signs_differ(sdf)))
        # surface cells must be level 0 (they are octree leaves)
        assert not np.any(np.asarray(lvl)[np.asarray(has)] > 0)

    def test_empty_volume_fully_merged(self):
        v = VoxelVolume(4, 10.0)  # all +30
        accel = build_accel(v.sdf, 4)
        lvl, has = unpack_accel(accel)
        assert not np.any(np.asarray(has))
        assert np.all(np.asarray(lvl) == 4)
