"""Render pipeline integration: modes, scene graph, engine, cameras."""

import numpy as np
import pytest

import jax.numpy as jnp

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.render.camera import camera_rays
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.scene.scene import (Camera, DirectionalLight, PointLight, Scene,
                             SpotLight, VoxelObject)
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def _simple_scene(**kw):
    vol = VoxelVolume.from_generator(
        S.Sphere(radius=50.0), 4, 100.0,
        material=Material(albedo=(0.9, 0.2, 0.2, 1.0), roughness=0.8))
    env = np.full((6, 2, 2, 3), (0.2, 0.4, 0.8), np.float32)
    defaults = dict(
        volumes=[vol], instances=[{"volume": 0}],
        camera={"position": (300.0, 0.0, 0.0),
                "rotation": np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                "fov": 60.0},
        dir_light={"direction": np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 6.0},
        env=env)
    defaults.update(kw)
    return build_scene(**defaults)


class TestCameraRays:
    def test_center_ray_is_forward(self):
        rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0))
        o, d = camera_rays(jnp.zeros(3), jnp.asarray(rot),
                           jnp.asarray(60.0), 3, 3)
        center = np.asarray(d[4])  # pixel (1,1)
        assert np.allclose(center, [-1, 0, 0], atol=1e-6)

    def test_directions_unnormalized(self):
        rot = np.asarray(vq.IDENTITY)
        o, d = camera_rays(jnp.zeros(3), jnp.asarray(rot),
                           jnp.asarray(60.0), 8, 8)
        lens = np.linalg.norm(np.asarray(d), axis=1)
        assert lens.max() > 1.05  # corners are longer than forward

    def test_fov_edges(self):
        rot = np.asarray(vq.IDENTITY)
        w = h = 101
        o, d = camera_rays(jnp.zeros(3), jnp.asarray(rot),
                           jnp.asarray(90.0), w, h)
        d = np.asarray(d).reshape(h, w, 3)
        # center column, top row: vertical angle ~ fov/2 (pixel centers)
        top = d[0, w // 2]
        ang = np.rad2deg(np.arctan2(top[2], top[0]))
        sy = (0.5 / h) * 2 - 1  # top pixel center in NDC
        expect = np.rad2deg(np.arctan(-sy * np.tan(np.deg2rad(45.0))))
        assert ang == pytest.approx(expect, abs=0.05)


class TestRenderModes:
    def test_all_8_modes_render(self):
        scene = _simple_scene()
        for mode_enum in range(8):
            mode = RenderMode.from_enum(mode_enum)
            img = np.asarray(render_image(scene, 16, 16, mode))
            assert img.shape == (16, 16, 4)
            assert np.isfinite(img).all(), mode_enum
            # sphere must occlude the sky somewhere in all modes
            sky = img[0, 0, :3]
            assert (np.abs(img[..., :3] - sky).sum(-1) > 0.05).any(), mode_enum

    def test_mode_enum_mapping(self):
        assert RenderMode.from_enum(0) == RenderMode(True, True, True)
        assert RenderMode.from_enum(1) == RenderMode(True, True, False)
        assert RenderMode.from_enum(2) == RenderMode(True, False, True)
        assert RenderMode.from_enum(3) == RenderMode(True, False, False)
        assert RenderMode.from_enum(4) == RenderMode(False, True, True)
        assert RenderMode.from_enum(7) == RenderMode(False, False, False)

    def test_unlit_is_albedo(self):
        scene = _simple_scene()
        img = np.asarray(render_image(scene, 17, 17, RenderMode(lit=False)))
        center = img[8, 8, :3]
        expect = np.asarray([0.9, 0.2, 0.2]) / (np.asarray([0.9, 0.2, 0.2]) + 1)
        expect = expect ** (1 / 2.2)
        assert np.allclose(center, expect, atol=1e-5)

    def test_miss_is_env(self):
        scene = _simple_scene()
        img = np.asarray(render_image(scene, 16, 16, RenderMode()))
        sky = np.asarray([0.2, 0.4, 0.8])
        expect = (sky / (sky + 1)) ** (1 / 2.2)
        assert np.allclose(img[0, 0, :3], expect, atol=1e-5)

    def test_shadows_darken(self):
        # second sphere between the light and the first one casts a shadow
        vol = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 4, 100.0,
            material=Material(albedo=(0.9, 0.9, 0.9, 1.0), roughness=0.8))
        # wi points toward the light: +X+Y illuminates the front face
        light_dir = np.asarray([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
        base = build_scene(
            [vol], [{"volume": 0}],
            camera={"position": (300.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)), "fov": 60.0},
            dir_light={"direction": light_dir, "strength": 6.0})
        img1 = np.asarray(render_image(base, 33, 33, RenderMode()))

        # occluder along wi from the front hit point (~(50,0,0) + t*wi)
        occluded = build_scene(
            [vol], [{"volume": 0},
                    {"volume": 0, "position": (191.0, 141.0, 0.0)}],
            camera={"position": (300.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)), "fov": 60.0},
            dir_light={"direction": light_dir, "strength": 6.0})
        img2 = np.asarray(render_image(occluded, 33, 33, RenderMode()))
        c1 = img1[16, 16, :3].sum()
        c2 = img2[16, 16, :3].sum()
        assert c2 < c1 * 0.6, (c1, c2)

    def test_point_light_illuminates(self):
        scene_dark = _simple_scene(dir_light=None, env=None)
        img_dark = np.asarray(render_image(scene_dark, 17, 17, RenderMode()))
        scene_lit = _simple_scene(
            dir_light=None, env=None,
            point_lights=[dict(position=(150.0, 0.0, 0.0), intensity=500.0,
                               color=(1.0, 1.0, 1.0, 1.0))])
        img_lit = np.asarray(render_image(scene_lit, 17, 17, RenderMode()))
        assert img_lit[8, 8, :3].sum() > img_dark[8, 8, :3].sum() + 0.1

    def test_spot_light_cone(self):
        spot = dict(position=(150.0, 0.0, 0.0), intensity=500.0,
                    forward=(-1.0, 0.0, 0.0), angle=30.0, falloff=10.0)
        scene = _simple_scene(dir_light=None, env=None, spot_lights=[spot])
        img = np.asarray(render_image(scene, 33, 33, RenderMode()))
        center = img[16, 16, :3].sum()
        edge = img[16, 2, :3].sum()
        assert center > edge + 0.05

    def test_reflective_sphere_sees_env(self):
        vol = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 4, 100.0,
            material=Material(albedo=(1.0, 1.0, 1.0, 1.0), roughness=0.1,
                              metallic=0.6))
        env = np.zeros((6, 2, 2, 3), np.float32)
        env[:] = (0.0, 1.0, 0.0)  # green sky everywhere
        scene = build_scene(
            [vol], [{"volume": 0}],
            camera={"position": (300.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)), "fov": 60.0},
            dir_light={"direction": np.asarray([0.0, 0.0, 1.0], np.float32),
                       "strength": 0.0},
            env=env)
        img = np.asarray(render_image(scene, 33, 33, RenderMode()))
        c = img[16, 16, :3]
        assert c[1] > 0.15, c  # mirror center reflects green env


class TestInstances:
    def test_transforms(self):
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        # translated instance: sphere should appear off-center
        scene = build_scene(
            [vol], [{"volume": 0, "position": (0.0, 80.0, 0.0)}],
            camera={"position": (300.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)), "fov": 60.0},
            dir_light={"direction": np.asarray([0, 0, 1.0], np.float32),
                       "strength": 3.0})
        img = np.asarray(render_image(scene, 33, 33, RenderMode(lit=False)))
        sky = img[0, 0, :3]
        mask = np.abs(img[..., :3] - sky).sum(-1) > 0.05
        ys, xs = np.where(mask)
        assert mask.any()
        # looking -X, camera xaxis = +world Y: +Y offset shifts blob right
        assert xs.mean() > 18.0

    def test_scaled_instance_bigger(self):
        vol = VoxelVolume.from_generator(S.Sphere(radius=40.0), 4, 100.0)
        def scene_with_scale(s):
            return build_scene(
                [vol], [{"volume": 0, "scale": (s, s, s)}],
                camera={"position": (300.0, 0.0, 0.0),
                        "rotation": np.asarray(
                            vq.from_euler_degrees(0.0, 180.0, 0.0)),
                        "fov": 60.0},
                dir_light={"direction": np.asarray([0, 0, 1.0], np.float32),
                           "strength": 3.0})
        def blob(s):
            img = np.asarray(render_image(scene_with_scale(s), 33, 33,
                                          RenderMode(lit=False)))
            sky = img[0, 0, :3]
            return (np.abs(img[..., :3] - sky).sum(-1) > 0.05).sum()
        assert blob(1.5) > blob(1.0) * 1.5

    def test_many_overlapping_instances_closest_hit(self):
        # Sequential candidate traversal (entry-t ordered, t_max-clamped)
        # must resolve the closest hit exactly like marching every
        # instance and min-reducing — including overlapping AABBs where a
        # later-entered instance holds the nearer surface.
        from vrt.march.march import march_volume
        from vrt.march.types import DeviceVolume
        from vrt.render.camera import camera_rays
        from vrt.render.renderer import march_scene

        vol_small = VoxelVolume.from_generator(S.Sphere(radius=30.0), 4,
                                               100.0)
        vol_big = VoxelVolume.from_generator(S.Sphere(radius=60.0), 4,
                                             100.0)
        vols = [vol_small, vol_big]
        # a line of 6 instances straddling the view axis, AABBs overlapping
        insts = [{"volume": i % 2, "position": (-40.0 * i, 12.0 * (i % 3),
                                                8.0 * (i % 2))}
                 for i in range(6)]
        scene = build_scene(
            vols, insts,
            camera={"position": (320.0, 0.0, 0.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)),
                    "fov": 60.0},
            dir_light={"direction": np.asarray([0, 0, 1.0], np.float32),
                       "strength": 3.0})
        o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                           24, 24)
        t_max = jnp.full(o.shape[0], 1e4, jnp.float32)
        hit, inst = march_scene(scene, o, d, t_max, interp=True)

        # brute force: march every instance separately, min-t reduce
        import vrt.core.quat as _vq
        best_t = np.full(o.shape[0], np.inf)
        best_i = np.full(o.shape[0], -1)
        for i, spec in enumerate(insts):
            dv = DeviceVolume.from_volume(vols[spec["volume"]])
            pos = np.asarray(spec["position"], np.float32)
            oo = np.asarray(o) - pos
            h = march_volume(dv, jnp.asarray(oo), d, t_max)
            t = np.where(np.asarray(h.hit), np.asarray(h.t), np.inf)
            closer = t < best_t
            best_t = np.where(closer, t, best_t)
            best_i = np.where(closer, i, best_i)
        np.testing.assert_array_equal(np.asarray(hit.hit),
                                      np.isfinite(best_t))
        m = np.isfinite(best_t)
        np.testing.assert_allclose(np.asarray(hit.t)[m], best_t[m],
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(inst)[m], best_i[m])


class TestSceneGraphAndEngine:
    def test_scene_to_gpu_and_engine_frames(self):
        from vrt.engine.engine import Engine, EngineInstance

        scene = Scene()
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        scene.spawn(VoxelObject(volume=vol))
        scene.spawn(Camera(position=np.asarray([300.0, 0, 0], np.float32),
                           rotation=np.asarray(
                               vq.from_euler_degrees(0.0, 180.0, 0.0))))
        scene.spawn(DirectionalLight(strength=5.0))
        scene.spawn(PointLight(position=np.asarray([0.0, 0, 200], np.float32)))
        scene.spawn(SpotLight())

        class Inst(EngineInstance):
            updates = 0

            def on_engine_update(self, engine, dt):
                Inst.updates += 1

        engine = Engine(Inst(), width=8, height=8)
        engine.set_scene(scene)
        engine.start(max_frames=2)
        assert engine.frame_count == 2
        assert Inst.updates == 2
        assert engine.last_frame.shape == (8, 8, 4)
        assert np.isfinite(engine.last_frame).all()

    def test_volume_sharing(self):
        scene = Scene()
        vol = VoxelVolume.from_generator(S.Sphere(radius=30.0), 3, 50.0)
        scene.spawn(VoxelObject(volume=vol))
        scene.spawn(VoxelObject(volume=vol,
                                position=np.asarray([0, 100, 0], np.float32)))
        assert len(scene.volumes) == 1
        assert len(scene.voxel_objects) == 2
        gpu = scene.to_gpu()
        assert gpu.volumes.sdf.shape[0] == 1
        assert gpu.num_instances == 2

    def test_mixed_resolutions_pad(self):
        scene = Scene()
        v1 = VoxelVolume.from_generator(S.Sphere(radius=30.0), 3, 50.0)
        v2 = VoxelVolume.from_generator(S.Sphere(radius=30.0), 5, 50.0)
        scene.spawn(VoxelObject(volume=v1))
        scene.spawn(VoxelObject(volume=v2,
                                position=np.asarray([0, 120, 0], np.float32)))
        scene.spawn(Camera(position=np.asarray([300.0, 60, 0], np.float32),
                           rotation=np.asarray(
                               vq.from_euler_degrees(0.0, 180.0, 0.0))))
        scene.spawn(DirectionalLight(strength=5.0))
        gpu = scene.to_gpu()
        assert gpu.volumes.sdf.shape[1] == 33  # padded to the larger volume
        img = np.asarray(render_image(gpu, 24, 24, RenderMode()))
        assert np.isfinite(img).all()
        sky = img[0, 0, :3]
        assert (np.abs(img[..., :3] - sky).sum(-1) > 0.05).sum() > 10


class TestChunkedRender:
    def test_chunked_matches_unchunked(self):
        scene = _simple_scene()
        img1 = np.asarray(render_image(scene, 19, 17, RenderMode()))
        img2 = np.asarray(render_image(scene, 19, 17, RenderMode(),
                                       chunk_size=64))
        np.testing.assert_allclose(img1, img2, atol=1e-6)

    def test_bf16_fast_march_close_to_f32(self):
        # fast-march mode: traversal from a bfloat16 corner table, resolve
        # from the f32 SDF.  Error is comparable to the reference's 15-bit
        # fixed-point volume encoding; images agree to 8-bit quantization
        # except (rarely) silhouette-grazing pixels.
        import jax.numpy as jnp
        from __graft_entry__ import _flagship_scene

        a = np.asarray(render_image(_flagship_scene(resolution=5),
                                    64, 64, RenderMode()))
        sc = _flagship_scene(resolution=5)
        import dataclasses
        vols = dataclasses.replace(
            sc.volumes, corners=sc.volumes.corners.astype(jnp.bfloat16))
        sc = dataclasses.replace(sc, volumes=vols)
        b = np.asarray(render_image(sc, 64, 64, RenderMode()))
        bad = (np.abs(a - b).max(-1) > 1 / 255).sum()
        assert bad <= 8, bad  # a handful of grazing pixels at most

    def test_deferred_reflection_matches_inline(self):
        # A reflective scene routes chunked renders through the wavefront
        # bounce pass (deferred via the linearity of radiance in Li);
        # composition is exact up to fp reassociation of the shade sums.
        from __graft_entry__ import _flagship_scene

        scene = _flagship_scene(resolution=4)
        assert scene.any_reflective
        img1 = np.asarray(render_image(scene, 48, 48, RenderMode()))
        for kw in (dict(chunk_size=256),
                   dict(chunk_size=256, sort_rays=True)):
            img2 = np.asarray(render_image(scene, 48, 48, RenderMode(),
                                           **kw))
            np.testing.assert_allclose(img1, img2, atol=1e-5), kw


class TestTextureLoading:
    def test_material_textures_load_into_atlas(self, tmp_path):
        from vrt.io.image import write_png
        from vrt.render.textures import build_texture_atlas
        from vrt.core.material import Material

        checker = np.zeros((4, 4, 3), np.uint8)
        checker[::2, ::2] = 255
        tex_path = str(tmp_path / "check.png")
        write_png(tex_path, checker)

        mats = [Material(albedo_texture=tex_path),
                Material(),  # defaults
                Material(albedo_texture=tex_path,   # cached, same slot
                         rm_texture="missing.png")]
        atlas, sizes, ids = build_texture_atlas(mats)
        assert atlas.shape[0] == 3  # white + flat-normal + checker
        assert ids[0] == (2, 1, 0)
        assert ids[1] == (0, 1, 0)
        assert ids[2] == (2, 1, 0)  # cache hit; missing rm -> default white
        assert tuple(sizes[2]) == (4, 4)

    def test_textured_scene_renders_pattern(self, tmp_path):
        from vrt.io.image import write_png
        from vrt.core.material import Material

        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:, :4] = (255, 0, 0)
        tex[:, 4:] = (0, 0, 255)
        tex_path = str(tmp_path / "stripe.png")
        write_png(tex_path, tex)

        scene = Scene()
        vol = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 4, 100.0,
            material=Material(albedo=(1, 1, 1, 1),
                              albedo_texture=tex_path,
                              texture_scale=(40.0, 40.0)))
        scene.spawn(VoxelObject(volume=vol))
        scene.spawn(Camera(position=np.asarray([300.0, 0, 0], np.float32),
                           rotation=np.asarray(
                               vq.from_euler_degrees(0.0, 180.0, 0.0))))
        img = np.asarray(render_image(scene.to_gpu(), 33, 33,
                                      RenderMode(lit=False)))
        sphere = img[10:23, 10:23, :3]
        # the stripe texture must appear: both red- and blue-dominant pixels
        assert (sphere[..., 0] > sphere[..., 2] + 0.2).any()
        assert (sphere[..., 2] > sphere[..., 0] + 0.2).any()


class TestDebugOverlay:
    def test_octree_bounds_drawn_red(self):
        scene = _simple_scene()
        img = np.asarray(render_image(scene, 49, 49,
                                      RenderMode(debug_overlay=True)))
        plain = np.asarray(render_image(scene, 49, 49, RenderMode()))
        assert np.isfinite(img).all()
        # overlay lanes show pure red (1,0,0) tonemapped
        red = (0.5 ** (1 / 2.2))
        red_px = (np.abs(img[..., 0] - red) < 1e-3) & (img[..., 1] < 1e-3)
        assert red_px.sum() > 10
        assert not np.allclose(img, plain)


class TestQuantizedDensities:
    def test_image_match_mode(self):
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        plain = _simple_scene()
        quant = _simple_scene(quantize_densities=True)
        # quantization is 0.01 steps: images nearly but not exactly equal
        i1 = np.asarray(render_image(plain, 17, 17, RenderMode()))
        i2 = np.asarray(render_image(quant, 17, 17, RenderMode()))
        assert np.abs(i1 - i2).max() < 0.05
        sq = np.asarray(quant.volumes.sdf[0])
        assert np.allclose(sq * 100, np.round(sq * 100), atol=1e-3)


class TestSortedRender:
    def test_sorted_matches_unsorted(self):
        scene = _simple_scene()
        img1 = np.asarray(render_image(scene, 19, 17, RenderMode()))
        img2 = np.asarray(render_image(scene, 19, 17, RenderMode(),
                                       chunk_size=64, sort_rays=True))
        np.testing.assert_allclose(img1, img2, atol=1e-6)


class TestIncrementalSync:
    def test_constants_update_without_volume_reupload(self):
        scene = Scene()
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        obj = scene.spawn(VoxelObject(volume=vol))
        scene.spawn(Camera(position=np.asarray([300.0, 0, 0], np.float32),
                           rotation=np.asarray(
                               vq.from_euler_degrees(0.0, 180.0, 0.0))))
        scene.spawn(DirectionalLight(strength=5.0))
        vol.clear_dirty()

        gpu1 = scene.sync_gpu(None)
        obj.position = np.asarray([0.0, 60.0, 0.0], np.float32)
        gpu2 = scene.sync_gpu(gpu1)
        # volumes were NOT rebuilt (same device buffers)...
        assert gpu2.volumes.sdf is gpu1.volumes.sdf
        # ...but transforms updated
        assert np.allclose(np.asarray(gpu2.inst_pos[0]), [0, 60, 0])
        img1 = np.asarray(render_image(gpu1, 16, 16, RenderMode()))
        img2 = np.asarray(render_image(gpu2, 16, 16, RenderMode()))
        assert not np.allclose(img1, img2)

        # dirty volume -> full rebuild
        vol.set_voxel((8, 8, 8), -3.0)
        gpu3 = scene.sync_gpu(gpu2)
        assert gpu3.volumes.sdf is not gpu2.volumes.sdf


class TestEmptyScene:
    def test_render_with_zero_instances(self):
        """An Engine frame rendered before any object is spawned must
        produce the pure-env image, not crash on an empty candidate list
        (ADVICE r4)."""
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 3, 100.0)
        env = np.full((6, 2, 2, 3), (0.25, 0.45, 0.85), np.float32)
        scene = build_scene([vol], [], camera={"position": (300.0, 0, 0)},
                            env=env)
        img = np.asarray(render_image(scene, 16, 12, RenderMode()))
        assert np.isfinite(img).all()
        # every pixel is the tonemapped env color
        assert np.allclose(img[..., :3], img[0, 0, :3], atol=1e-6)
