"""Voxelizer: triangle distance regions, glTF import, native parity."""

import base64
import json
import os
import tempfile

import numpy as np
import pytest

from vrt.io.gltf import load_gltf
from vrt.io.voxelize import extract_resolution_from_name, voxelize_mesh


def _cube_mesh(half=30.0):
    v = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                  [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
                 np.float64) * half
    f = np.array([0, 1, 2, 0, 2, 3, 4, 6, 5, 4, 7, 6, 0, 4, 5, 0, 5, 1,
                  1, 5, 6, 1, 6, 2, 2, 6, 7, 2, 7, 3, 3, 7, 4, 3, 4, 0],
                 np.int64)
    return v, f


class TestResolutionSuffix:
    def test_parse(self):
        assert extract_resolution_from_name("cubeMesh_6") == 6
        assert extract_resolution_from_name("mesh") == 5
        assert extract_resolution_from_name("mesh_9") == 5  # > 8 -> default
        assert extract_resolution_from_name("mesh_abc") == 5


class TestVoxelizeMesh:
    def test_cube_shell(self):
        v, f = _cube_mesh(30.0)
        vol = voxelize_mesh(v, f, resolution=4, extends=37.5)
        law = vol.law
        h = law.cell_size
        threshold = h * np.sqrt(3.0)
        n = vol.n_voxels

        # voxel on the face plane: distance 0 -> density -0.5
        idx = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1)
        pos = idx * h - vol.extends
        on_face = np.abs(np.abs(pos[..., 0]) - 30.0) < 1e-6
        inside_quad = (np.abs(pos[..., 1]) <= 29.0) & (np.abs(pos[..., 2]) <= 29.0)
        sel = on_face & inside_quad
        if sel.any():
            d_face = vol.sdf[sel]
            expect = -(1.0 - np.abs(np.abs(pos[sel][:, 0]) - 30.0)
                       / threshold) + 0.5
            assert np.allclose(d_face, expect, atol=1e-4)

        # the grid center (far from any face) keeps the fill density
        assert vol.sdf[n // 2, n // 2, n // 2] == pytest.approx(
            vol.extends * 2.0)

        # the shell has negative voxels and they carry material 1
        assert (vol.sdf < 0).any()
        assert np.array_equal(vol.voxel_materials == 1, vol.sdf <= 0.0)

    def test_extends_law(self):
        v, f = _cube_mesh(40.0)
        vol = voxelize_mesh(v, f, resolution=3)
        assert vol.extends == pytest.approx(40.0 * 1.25)

    def test_renderable(self):
        # the voxelized cube actually renders: ray from +X hits the shell
        import jax.numpy as jnp
        from vrt.march.march import march_volume
        from vrt.march.types import DeviceVolume

        v, f = _cube_mesh(30.0)
        vol = voxelize_mesh(v, f, resolution=5, extends=37.5)
        dv = DeviceVolume.from_volume(vol)
        o = jnp.asarray([[200.0, 3.0, -2.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        hit = march_volume(dv, o, d, jnp.asarray([1e4]))
        assert bool(hit.hit[0])
        # isosurface sits at ~threshold/2 outside the mesh face
        t = float(hit.t[0])
        surf_x = 200.0 - t
        assert abs(surf_x - 30.0) < vol.cell_size * 2


@pytest.mark.skipif(not __import__("vrt.native", fromlist=["lib"]).lib,
                    reason="native lib unavailable")
class TestNativeParity:
    def test_voxelize_identical(self):
        from vrt.native import lib
        v, f = _cube_mesh(25.0)
        vol = voxelize_mesh(v, f, resolution=4, extends=31.25)
        sdf, mats = lib.voxelize(v, f, 4, 31.25)
        assert np.abs(sdf - vol.sdf).max() < 1e-6
        assert np.array_equal(mats, vol.voxel_materials)

    def test_accel_identical(self):
        from vrt.native import lib
        from vrt.volume.accel import build_accel
        rng = np.random.default_rng(0)
        n = 17
        sdf = rng.normal(size=(n, n, n)).astype(np.float32)
        assert np.array_equal(lib.build_accel(sdf, 4),
                              np.asarray(build_accel(sdf, 4)))

    def test_codec_identical(self):
        from vrt.io import voxfile
        from vrt.native import lib
        v, f = _cube_mesh(25.0)
        vol = voxelize_mesh(v, f, resolution=3, extends=31.25)
        assert lib.encode_voxels(vol.sdf, vol.voxel_materials) == \
            voxfile.volume_to_archive(vol).buffer


class TestGLTF:
    def _write_gltf(self, tmpdir):
        # unit cube, 1m -> importer scales x100
        v, f = _cube_mesh(0.5)
        pos = v.astype(np.float32)
        nrm = np.zeros_like(pos)
        nrm[:, 2] = 1.0
        idx = f.astype(np.uint16)
        bin_data = (idx.tobytes() + pos.tobytes() + nrm.tobytes())
        doc = {
            "asset": {"version": "2.0"},
            "buffers": [{"byteLength": len(bin_data),
                         "uri": "data:application/octet-stream;base64,"
                         + base64.b64encode(bin_data).decode()}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": idx.nbytes},
                {"buffer": 0, "byteOffset": idx.nbytes,
                 "byteLength": pos.nbytes},
                {"buffer": 0, "byteOffset": idx.nbytes + pos.nbytes,
                 "byteLength": nrm.nbytes}],
            "accessors": [
                {"bufferView": 0, "componentType": 5123,
                 "count": len(idx), "type": "SCALAR"},
                {"bufferView": 1, "componentType": 5126, "count": 8,
                 "type": "VEC3",
                 "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
                {"bufferView": 2, "componentType": 5126, "count": 8,
                 "type": "VEC3"}],
            "materials": [{"name": "mat0", "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.1, 0.2, 1.0],
                "metallicFactor": 0.3, "roughnessFactor": 0.7}}],
            "meshes": [{"name": "cube_4", "primitives": [{
                "attributes": {"POSITION": 1, "NORMAL": 2},
                "indices": 0, "material": 0}]}],
            "nodes": [
                {"name": "cubeNode", "mesh": 0,
                 "translation": [1.0, 2.0, 3.0]},
                {"name": "Light_Point01", "translation": [0, 0, 5],
                 "extras": {"strength": 42.0, "color_r": 1.0, "color_g": 0.5,
                            "color_b": 0.25, "attl": 0.1, "attexp": 0.02}},
                {"name": "Light_Spot01", "extras": {"angle": 50.0,
                                                    "fangle": 12.0}},
                {"name": "Light_Sun"}],
            "scenes": [{"nodes": [0, 1, 2, 3]}], "scene": 0,
        }
        path = os.path.join(tmpdir, "model.gltf")
        json.dump(doc, open(path, "w"))
        return path

    def test_import(self):
        with tempfile.TemporaryDirectory() as tmp:
            info = load_gltf(self._write_gltf(tmp))
        assert len(info.meshes) == 1
        mesh = info.meshes[0]
        assert mesh.name == "cube_4"
        # scaled x100 and recentered: half extents 50
        assert mesh.vertices.max() == pytest.approx(50.0)
        assert mesh.vertices.min() == pytest.approx(-50.0)
        assert mesh.material.albedo == pytest.approx((0.9, 0.1, 0.2, 1.0))
        assert mesh.material.metallic == pytest.approx(0.3)

        assert len(info.objects) == 1
        assert np.allclose(info.objects[0].position, [100.0, 200.0, 300.0])

        kinds = sorted(l.kind for l in info.lights)
        assert kinds == ["directional", "point", "spot"]
        point = next(l for l in info.lights if l.kind == "point")
        assert point.intensity == 42.0
        assert point.color[:3] == (1.0, 0.5, 0.25)
        assert point.att_l == pytest.approx(0.1)
        assert np.allclose(point.position, [0, 0, 500.0])
        spot = next(l for l in info.lights if l.kind == "spot")
        assert spot.angle == 50.0
        assert spot.falloff_angle == 12.0

    def test_end_to_end_vox(self):
        from vrt.apps.voxelize import convert
        from vrt.io.voxfile import load_scene
        with tempfile.TemporaryDirectory() as tmp:
            path = self._write_gltf(tmp)
            out = convert(path, verbose=False)
            scene = load_scene(out)
        assert len(scene.voxel_objects) == 1
        vol = scene.voxel_objects[0].volume
        assert vol.resolution == 4  # from the cube_4 name suffix
        assert (vol.sdf < 0).any()
        assert len(scene.point_lights) == 1
        assert scene.point_lights[0].strength == 42.0


class TestVoxelizedMeshGolden:
    """BASELINE config 3's image check: a glTF mesh voxelized through the
    full path renders allclose to the scalar NumPy oracle (feasible res)."""

    def test_voxelized_gltf_render_matches_numpy(self):
        from tests import numpy_reference as ref
        from vrt.apps.make_assets import torus_mesh, write_gltf_mesh
        from vrt.apps.voxelize import convert
        from vrt.core import quat as vq
        from vrt.io.voxfile import load_scene
        from vrt.render.gpuscene import RenderMode, build_scene
        from vrt.render.renderer import render_image

        verts, faces = torus_mesh(nu=24, nv=12)
        with tempfile.TemporaryDirectory() as tmp:
            gltf = os.path.join(tmp, "scene.gltf")
            write_gltf_mesh(gltf, verts, faces, name="torus_4",
                            material={"baseColor": [0.8, 0.4, 0.3, 1.0],
                                      "roughness": 0.6, "metallic": 0.2})
            scene = load_scene(convert(gltf, verbose=False))
        vol = scene.voxel_objects[0].volume
        assert vol.resolution == 4

        cam_pos = (250.0, 0.0, 120.0)
        cam_rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, -25.0))
        light_dir = np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 30.0, -40.0)))
        env_color = (0.2, 0.3, 0.5)
        gpu = build_scene(
            [vol], [{"volume": 0}],
            camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
            dir_light=dict(direction=light_dir, strength=5.0),
            env=np.full((6, 2, 2, 3), env_color, np.float32))
        w, h = 32, 24
        got = np.asarray(render_image(gpu, w, h,
                                      RenderMode(textured=False)))[..., :3]

        rvol = ref.Volume(vol.sdf, vol.resolution, vol.extends)
        m = vol.material
        want = ref.render_notex_lit(
            rvol, w, h, cam_pos, cam_rot, 60.0, light_dir, 5.0,
            np.asarray(m.albedo[:3]), m.roughness, m.metallic, env_color)

        diff = np.abs(got - want)
        assert np.quantile(diff, 0.98) < 5e-3, np.quantile(diff, 0.98)
        assert diff.mean() < 2e-3, diff.mean()
        assert (diff.max(axis=-1) > 0.05).mean() < 0.01
