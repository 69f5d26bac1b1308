"""IO: .vox archive codec, scene roundtrip, image codecs."""

import os
import struct
import tempfile

import numpy as np
import pytest

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.io import voxfile
from vrt.io.image import read_png, write_png, write_ppm
from vrt.scene.scene import (DirectionalLight, PointLight, Scene, SpotLight,
                             VoxelObject)
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


class TestArchiveFormat:
    def test_node_binary_layout(self):
        a = voxfile.Archive(buffer=b"\x01\x02")
        a.props["X"] = voxfile.Archive.from_scalar("f", 1.5)
        with tempfile.NamedTemporaryFile(suffix=".vox", delete=False) as f:
            path = f.name
        voxfile.save_archive(a, path)
        raw = open(path, "rb").read()
        os.unlink(path)
        # u64 bufsize, buffer, u64 nprops, u64 namelen, name\0, child...
        assert raw[:8] == struct.pack("<Q", 2)
        assert raw[8:10] == b"\x01\x02"
        assert raw[10:18] == struct.pack("<Q", 1)
        assert raw[18:26] == struct.pack("<Q", 2)
        assert raw[26:28] == b"X\x00"
        assert raw[28:36] == struct.pack("<Q", 4)
        assert struct.unpack("<f", raw[36:40])[0] == 1.5

    def test_roundtrip_nested(self):
        a = voxfile.Archive(buffer=b"abc")
        a.props["child"] = voxfile.Archive(buffer=b"def")
        a.props["child"].props["leaf"] = voxfile.Archive.from_scalar("Q", 42)
        with tempfile.NamedTemporaryFile(suffix=".vox", delete=False) as f:
            path = f.name
        voxfile.save_archive(a, path)
        b = voxfile.load_archive(path)
        os.unlink(path)
        assert b.buffer == b"abc"
        assert b.props["child"].buffer == b"def"
        assert b.props["child"].props["leaf"].scalar("Q") == 42


class TestVolumeArchive:
    def test_roundtrip(self):
        vol = VoxelVolume.from_generator(
            S.Sphere(radius=5.0), 3, 10.0,
            material=Material(albedo=(0.1, 0.2, 0.3, 1.0), roughness=0.4,
                              metallic=0.5, albedo_texture="tex/a.png"))
        a = voxfile.volume_to_archive(vol)
        vol2 = voxfile.archive_to_volume(a)
        assert vol2.resolution == 3
        assert vol2.extends == 10.0
        assert np.allclose(vol2.sdf, vol.sdf)
        assert np.array_equal(vol2.voxel_materials, vol.voxel_materials)
        assert vol2.material.albedo == pytest.approx((0.1, 0.2, 0.3, 1.0))
        assert vol2.material.roughness == pytest.approx(0.4)
        assert vol2.material.albedo_texture == "tex/a.png"

    def test_voxel_buffer_is_8_bytes_reference_layout(self):
        # VVoxel = {u8 material, 3 pad, f32 density}, x-major then z then y
        vol = VoxelVolume(1, 1.0)  # 3^3
        vol.set_voxel((1, 2, 0), -7.5, 3)
        a = voxfile.volume_to_archive(vol)
        n = 3
        flat_index = 1 * n * n + 0 * n + 2  # x*n*n + z*n + y
        rec = a.buffer[flat_index * 8:(flat_index + 1) * 8]
        assert rec[0] == 3
        assert struct.unpack("<f", rec[4:8])[0] == -7.5


class TestSceneRoundtrip:
    def test_full_scene(self):
        scene = Scene()
        vol = VoxelVolume.from_generator(S.Sphere(radius=5.0), 3, 10.0)
        scene.spawn(VoxelObject(volume=vol,
                                position=np.asarray([1.0, 2.0, 3.0], np.float32),
                                scale=np.asarray([2.0, 2.0, 2.0], np.float32),
                                rotation=np.asarray(
                                    vq.from_euler_degrees(0.0, 45.0, 0.0))))
        scene.spawn(DirectionalLight(strength=6.0,
                                     rotation=np.asarray(
                                         vq.from_euler_degrees(0.0, 45.0, -30.0))))
        scene.spawn(PointLight(position=np.asarray([5.0, 0.0, 0.0], np.float32),
                               strength=10.0, att_linear=0.25, att_exp=0.01))
        scene.spawn(SpotLight(strength=20.0, angle=50.0, falloff_angle=15.0))

        with tempfile.NamedTemporaryFile(suffix=".vox", delete=False) as f:
            path = f.name
        voxfile.save_scene(scene, path)
        s2 = voxfile.load_scene(path)
        os.unlink(path)

        assert len(s2.voxel_objects) == 1
        obj = s2.voxel_objects[0]
        assert np.allclose(obj.position, [1, 2, 3])
        assert np.allclose(obj.scale, 2.0)
        assert obj.volume.resolution == 3
        assert np.allclose(obj.volume.sdf, vol.sdf)
        assert s2.active_directional_light is not None
        assert s2.active_directional_light.strength == pytest.approx(6.0)
        assert len(s2.point_lights) == 1
        assert s2.point_lights[0].att_linear == pytest.approx(0.25)
        assert len(s2.spot_lights) == 1
        assert s2.spot_lights[0].angle == pytest.approx(50.0)
        assert s2.spot_lights[0].falloff_angle == pytest.approx(15.0)

    def test_rendered_roundtrip_identical(self):
        # loading a saved scene renders identically
        import jax.numpy as jnp
        from vrt.render.gpuscene import RenderMode
        from vrt.render.renderer import render_image

        scene = Scene()
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        scene.spawn(VoxelObject(volume=vol))
        scene.spawn(DirectionalLight(strength=5.0))
        from vrt.scene.scene import Camera
        scene.spawn(Camera(position=np.asarray([300.0, 0, 0], np.float32),
                           rotation=np.asarray(
                               vq.from_euler_degrees(0.0, 180.0, 0.0))))
        with tempfile.NamedTemporaryFile(suffix=".vox", delete=False) as f:
            path = f.name
        voxfile.save_scene(scene, path)
        s2 = voxfile.load_scene(path)
        os.unlink(path)
        # camera isn't serialized by the reference format; re-add
        s2.spawn(Camera(position=np.asarray([300.0, 0, 0], np.float32),
                        rotation=np.asarray(
                            vq.from_euler_degrees(0.0, 180.0, 0.0))))
        img1 = np.asarray(render_image(scene.to_gpu(), 16, 16, RenderMode()))
        img2 = np.asarray(render_image(s2.to_gpu(), 16, 16, RenderMode()))
        assert np.allclose(img1, img2, atol=1e-6)


class TestImages:
    def test_png_roundtrip(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(7, 5, 3), dtype=np.uint8)
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            path = f.name
        write_png(path, img)
        back = read_png(path)
        os.unlink(path)
        assert np.array_equal(back, img)

    def test_png_float_input(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = (1.0, 0.5, np.nan)
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            path = f.name
        write_png(path, img)
        back = read_png(path)
        os.unlink(path)
        assert back[0, 0, 0] == 255
        assert back[0, 0, 2] == 0  # NaN flushed

    def test_ppm(self):
        img = np.full((3, 4, 3), 128, np.uint8)
        with tempfile.NamedTemporaryFile(suffix=".ppm", delete=False) as f:
            path = f.name
        write_ppm(path, img)
        raw = open(path, "rb").read()
        os.unlink(path)
        assert raw.startswith(b"P6\n4 3\n255\n")
        assert len(raw) == len(b"P6\n4 3\n255\n") + 36


class TestDDS:
    def _write_uncompressed_cube(self, path, edge, colors):
        import struct
        # minimal DDS header: uncompressed 32-bit BGRA cubemap, 1 mip
        flags = 0x1 | 0x2 | 0x4 | 0x1000
        header = struct.pack("<4sIIIIIII44x", b"DDS ", 124, flags, edge,
                             edge, edge * 4, 0, 1)
        pf = struct.pack("<IIIIIIII", 32, 0x41, 0, 32,
                         0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
        caps = struct.pack("<IIIII", 0x1000 | 0x8, 0x200 | 0xFE00, 0, 0, 0)
        with open(path, "wb") as f:
            f.write(header + pf + caps)
            for face in range(6):
                r, g, b = colors[face]
                texel = bytes([b, g, r, 255]) * (edge * edge)
                f.write(texel)

    def test_cubemap_roundtrip(self):
        from vrt.io.image import read_dds_cubemap
        colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                  (255, 255, 0), (0, 255, 255), (255, 0, 255)]
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "sky.dds")
            self._write_uncompressed_cube(path, 4, colors)
            env = read_dds_cubemap(path)
        assert env.shape == (6, 4, 4, 3)
        for f, (r, g, b) in enumerate(colors):
            assert np.allclose(env[f, 0, 0] * 255, (r, g, b), atol=1)


class TestDDSWriter:
    def test_write_read_roundtrip(self):
        from vrt.io.image import read_dds_cubemap, write_dds_cubemap
        rng = np.random.default_rng(0)
        env = rng.uniform(size=(6, 8, 8, 3)).astype(np.float32)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "sky.dds")
            write_dds_cubemap(path, env)
            back = read_dds_cubemap(path)
        assert back.shape == env.shape
        np.testing.assert_allclose(back, env, atol=1 / 255.0 + 1e-6)


class TestPNGFilters:
    """All five PNG row filters (the reference loads arbitrary WIC PNGs,
    TextureFactory.cpp:71-117): native unfilter vs a scalar oracle, and
    real-size decode staying fast enough for texture atlases."""

    @staticmethod
    def _scalar_unfilter(raw, h, stride, ch):
        out = np.zeros((h, stride), np.int32)
        prev = np.zeros(stride, np.int32)
        off = 0
        for y in range(h):
            f = raw[off]
            line = np.frombuffer(raw, np.uint8, stride,
                                 off + 1).astype(np.int32)
            off += 1 + stride
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2}.get(f)
                if pred is None:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
            out[y] = cur
            prev = cur
        return out.astype(np.uint8)

    def test_all_filters_match_oracle(self):
        from vrt.io.image import _png_unfilter
        rng = np.random.default_rng(7)
        h, w, ch = 11, 13, 4
        stride = w * ch
        rows = []
        for y in range(h):
            rows.append(bytes([y % 5]) + rng.integers(
                0, 256, stride, dtype=np.uint8).tobytes())
        raw = b"".join(rows)
        got = _png_unfilter(raw, h, stride, ch)
        want = self._scalar_unfilter(raw, h, stride, ch)
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_large_is_fast(self):
        import time
        import zlib as _z
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (512, 512, 4), dtype=np.uint8)
        # encode rows with paeth (filter 4) via the inverse recurrence
        stride = 512 * 4
        enc = bytearray()
        prev = np.zeros(stride, np.int32)
        for y in range(512):
            cur = img[y].reshape(-1).astype(np.int32)
            a = np.concatenate([np.zeros(4, np.int32), cur[:-4]])
            b = prev
            c = np.concatenate([np.zeros(4, np.int32), prev[:-4]])
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, b, c))
            enc += b"\x04" + ((cur - pred) & 0xFF).astype(
                np.uint8).tobytes()
            prev = cur
        raw = bytes(enc)
        from vrt.io.image import _png_unfilter
        t0 = time.perf_counter()
        got = _png_unfilter(raw, 512, stride, 4)
        dt = time.perf_counter() - t0
        np.testing.assert_array_equal(got.reshape(512, 512, 4), img)
        assert dt < 2.0, f"unfilter too slow: {dt:.2f}s"
        del _z


class TestDXT1:
    def test_block_decode_matches_scalar(self):
        from vrt.io.image import _decode_dxt1
        rng = np.random.default_rng(5)
        w = h = 16
        data = rng.integers(0, 256, (w // 4) * (h // 4) * 8,
                            dtype=np.uint8).tobytes()
        got = _decode_dxt1(data, w, h)

        # scalar oracle
        out = np.zeros((h, w, 3), np.uint8)
        pos = 0
        for by in range(h // 4):
            for bx in range(w // 4):
                c0, c1, bits = struct.unpack_from("<HHI", data, pos)
                pos += 8
                pal = np.zeros((4, 3), np.int32)
                pal[0] = ((c0 >> 11) * 255 // 31,
                          ((c0 >> 5) & 63) * 255 // 63, (c0 & 31) * 255 // 31)
                pal[1] = ((c1 >> 11) * 255 // 31,
                          ((c1 >> 5) & 63) * 255 // 63, (c1 & 31) * 255 // 31)
                if c0 > c1:
                    pal[2] = (2 * pal[0] + pal[1]) // 3
                    pal[3] = (pal[0] + 2 * pal[1]) // 3
                else:
                    pal[2] = (pal[0] + pal[1]) // 2
                    pal[3] = 0
                for py in range(4):
                    for px in range(4):
                        idx = (bits >> (2 * (py * 4 + px))) & 3
                        out[by * 4 + py, bx * 4 + px] = pal[idx]
        np.testing.assert_array_equal(got, out)

    def test_non_multiple_of_4(self):
        from vrt.io.image import _decode_dxt1
        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, 2 * 2 * 8, dtype=np.uint8).tobytes()
        got = _decode_dxt1(data, 6, 5)
        assert got.shape == (5, 6, 3)


class TestReferenceLayoutFixture:
    """Golden fixture: a byte stream produced by an independent C++ writer
    (tests/fixtures/gen_vox_fixture.cpp) replicating the REFERENCE layout
    rules (SerializationManager.cpp:22-46, Scene.cpp:314-460,
    VoxelVolume.cpp:178-199, Material.cpp:18-70) — including unordered_map
    property order, MSVC VVoxel padding, Eigen quaternion byte order, and
    the writer's RMTexture-gets-the-albedo-path quirk."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "reference_layout.vox")

    def test_decodes_field_for_field(self):
        scene = voxfile.load_scene(self.FIXTURE)

        # volume: resolution 2 -> n=5, extends 120
        assert len(scene.volumes) == 1
        vol = scene.volumes[0]
        assert vol.resolution == 2
        assert vol.extends == pytest.approx(120.0)
        n = 5
        x, y, z = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                              indexing="ij")
        want_sdf = (x - y * 0.5 + z * 0.25 - 1.0).astype(np.float32)
        want_mat = ((x + 2 * y + 3 * z) % 7).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(vol.sdf), want_sdf)
        np.testing.assert_array_equal(
            np.asarray(vol.voxel_materials, np.uint8), want_mat)

        # material (RMTexture carries the albedo path: reference writer bug)
        m = vol.material
        np.testing.assert_allclose(m.albedo, (0.25, 0.5, 0.75, 1.0))
        assert m.roughness == pytest.approx(0.4)
        assert m.metallic == pytest.approx(0.6)
        np.testing.assert_allclose(m.texture_scale, (100.0, 50.0))
        assert m.albedo_texture == "tex/albedo.png"
        assert m.normal_texture == "tex/normal.png"
        assert m.rm_texture == "tex/albedo.png"

        # object TRS
        objs = scene.voxel_objects
        assert len(objs) == 1 and objs[0].volume is vol
        np.testing.assert_allclose(objs[0].position, (10.0, -20.0, 30.0))
        np.testing.assert_allclose(objs[0].scale, (1.0, 2.0, 0.5))
        np.testing.assert_allclose(objs[0].rotation,
                                   (0.0, 0.0, 0.7071068, 0.7071068))

        # lights
        dl = scene.active_directional_light
        np.testing.assert_allclose(dl.rotation, (0.1, 0.2, 0.3, 0.9273618))
        assert dl.strength == pytest.approx(6.0)
        (pl,) = scene.point_lights
        np.testing.assert_allclose(pl.position, (5.0, 6.0, 7.0))
        np.testing.assert_allclose(pl.color, (1.0, 0.5, 0.25, 1.0))
        assert pl.strength == pytest.approx(80.0)
        assert pl.att_linear == pytest.approx(0.5)
        assert pl.att_exp == pytest.approx(0.005)
        (sl,) = scene.spot_lights
        np.testing.assert_allclose(sl.position, (-3.0, 0.0, 9.0))
        assert sl.strength == pytest.approx(40.0)
        assert sl.falloff_angle == pytest.approx(20.0)
        assert sl.angle == pytest.approx(45.0)

    def test_property_order_is_not_insertion_order(self):
        # the fixture was written through an unordered_map: if this ever
        # starts matching insertion order exactly, the fixture stops
        # exercising order independence — regenerate with a shuffle.
        a = voxfile.load_archive(self.FIXTURE)
        insertion = ["VCount", "V_0", "OCount", "OI_0", "O_0", "LDCount",
                     "LD_0", "LPCount", "LP_0", "LSCount", "LS_0"]
        assert set(a.props) == set(insertion)
        assert list(a.props) != insertion

    def test_roundtrip_preserves_scene(self):
        scene = voxfile.load_scene(self.FIXTURE)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "roundtrip.vox")
            voxfile.save_scene(scene, path)
            back = voxfile.load_scene(path)
        np.testing.assert_array_equal(np.asarray(back.volumes[0].sdf),
                                      np.asarray(scene.volumes[0].sdf))
        np.testing.assert_allclose(back.voxel_objects[0].rotation,
                                   scene.voxel_objects[0].rotation)
