"""Core math: grid laws, quaternions, materials."""

import numpy as np
import pytest

from vrt.core import quat as vq
from vrt.core.grid import (GridLaw, flat_to_xyz, xyz_to_flat,
                           quantize_density_like_reference)
from vrt.core.material import Material


class TestGridLaw:
    def test_size_law(self):
        # n = 2^r + 1 (VoxelVolume.cpp:23)
        assert GridLaw(1, 1.0).n_voxels == 3
        assert GridLaw(6, 100.0).n_voxels == 65
        assert GridLaw(8, 100.0).n_voxels == 257

    def test_cell_size(self):
        law = GridLaw(6, 100.0)
        assert law.cell_size == pytest.approx(200.0 / 64.0)
        assert law.n_cells == 64

    def test_voxel_positions_span_volume(self):
        law = GridLaw(4, 50.0)
        assert float(law.voxel_to_position(np.zeros(3))[0]) == -50.0
        p = law.voxel_to_position(np.full(3, law.n_voxels - 1))
        assert float(p[0]) == pytest.approx(50.0)

    def test_position_to_cell_floor(self):
        law = GridLaw(4, 50.0)
        c = law.position_to_cell(np.array([-50.0 + 0.5 * law.cell_size,
                                           0.0, 49.9]))
        assert int(c[0]) == 0
        assert int(c[1]) == 8
        assert int(c[2]) == 15

    def test_flat_order_roundtrip(self):
        n = 5
        arr = np.random.default_rng(0).normal(size=(n, n, n)).astype(np.float32)
        assert np.array_equal(flat_to_xyz(xyz_to_flat(arr), n), arr)

    def test_flat_order_is_x_major_then_z_then_y(self):
        # Index3DTo1D(x,y,z) = x*n*n + z*n + y
        n = 4
        arr = np.zeros((n, n, n), np.float32)
        x, y, z = 1, 2, 3
        arr[x, y, z] = 7.0
        flat = xyz_to_flat(arr)
        assert flat[x * n * n + z * n + y] == 7.0

    def test_quantize(self):
        q = quantize_density_like_reference(np.array([0.1234, -5.6789, 400.0]))
        assert np.allclose(np.asarray(q), [0.12, -5.67, 327.67], atol=1e-6)


class TestQuat:
    def test_axis_angle_rotation(self):
        q = vq.from_axis_angle(vq.UP, np.float32(np.pi / 2))
        v = vq.rotate(q, vq.FORWARD)
        # rotating +X by 90deg about +Z gives +Y
        assert np.allclose(v, [0, 1, 0], atol=1e-6)

    def test_euler_yaw_180(self):
        q = vq.from_euler_degrees(0.0, 180.0, 0.0)
        f = vq.forward_vector(q)
        assert np.allclose(f, [-1, 0, 0], atol=1e-6)

    def test_euler_order_matches_reference(self):
        # FromEulerAngles = pitch(RIGHT) * yaw(UP) * roll(FORWARD)
        roll, yaw, pitch = 10.0, 20.0, 30.0
        q = vq.from_euler_degrees(roll, yaw, pitch)
        qp = vq.from_axis_angle(vq.RIGHT, np.float32(np.deg2rad(pitch)))
        qy = vq.from_axis_angle(vq.UP, np.float32(np.deg2rad(yaw)))
        qr = vq.from_axis_angle(vq.FORWARD, np.float32(np.deg2rad(roll)))
        expect = vq.multiply(vq.multiply(qp, qy), qr)
        assert np.allclose(q, expect, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = 0.7
        q = vq.from_axis_angle(axis.astype(np.float32), np.float32(ang))
        v = rng.normal(size=3).astype(np.float32)
        # Rodrigues
        expect = (v * np.cos(ang) + np.cross(axis, v) * np.sin(ang)
                  + axis * np.dot(axis, v) * (1 - np.cos(ang)))
        assert np.allclose(vq.rotate(q, v), expect, atol=1e-5)

    def test_multiply_inverse(self):
        q = vq.from_euler_degrees(15.0, 40.0, -25.0)
        qi = vq.inverse(q)
        ident = vq.multiply(q, qi)
        assert np.allclose(ident, vq.IDENTITY, atol=1e-6)

    def test_from_two_vectors(self):
        a = np.array([1.0, 0, 0], np.float32)
        b = np.array([0, 0, 1.0], np.float32)
        q = vq.from_two_vectors(a, b)
        assert np.allclose(vq.rotate(q, a), b, atol=1e-6)

    def test_host_path_stays_numpy(self):
        q = vq.from_euler_degrees(0.0, 90.0, 0.0)
        assert isinstance(q, np.ndarray)
        assert isinstance(vq.forward_vector(q), np.ndarray)


class TestMaterial:
    def test_defaults(self):
        m = Material()
        assert m.albedo == (0.8, 0.8, 0.8, 1.0)
        assert m.roughness == 0.8
        assert m.metallic == 0.0
        assert m.texture_scale == (100.0, 100.0)

    def test_k(self):
        # k = (r+1)^2/8 (RDXVoxelVolume.cpp:383)
        assert Material(roughness=1.0).k == pytest.approx(0.5)
        assert Material(roughness=0.0).k == pytest.approx(1.0 / 8.0)
