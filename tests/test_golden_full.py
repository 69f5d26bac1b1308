"""Full-pipeline golden images: every render mode, two overlapping
instances, point+spot lights, mirror reflection, patterned cubemap, and
triplanar textures — vrt vs the independent scalar NumPy re-derivation
(tests/numpy_reference.py, written against the DXR shader sources).

Covers the 8 pipeline variants the reference compiles
(``EVRenderMode``, ``DXRenderer.cpp:707-762``).
"""

import numpy as np
import pytest

from tests import numpy_reference as ref
from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def _checker(n, a, b):
    t = np.zeros((n, n, 3), np.float32)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = ((yy // 2 + xx // 2) % 2).astype(bool)
    t[m] = a
    t[~m] = b
    return t


def _env_pattern(e=8):
    env = np.zeros((6, e, e, 3), np.float32)
    base = [(0.6, 0.2, 0.2), (0.2, 0.6, 0.2), (0.2, 0.2, 0.6),
            (0.6, 0.6, 0.2), (0.2, 0.6, 0.6), (0.6, 0.2, 0.6)]
    for f in range(6):
        env[f] = base[f]
        env[f, : e // 2, : e // 2] = np.asarray(base[f]) * 0.4
    return env


def _scene_pair():
    """A reflective sphere overlapping a rough CSG slab on screen."""
    sphere = VoxelVolume.from_generator(
        S.Sphere(radius=55.0), 4, 100.0,
        material=Material(albedo=(0.85, 0.25, 0.2, 1.0), roughness=0.12,
                          metallic=0.55, texture_scale=(60.0, 60.0)))
    csg = S.CSG(shape=S.Box(extends=(45.0, 60.0, 45.0)))
    csg.add_child(S.Sphere(radius=40.0,
                           position=np.array([0.0, 0.0, 55.0], np.float32)),
                  S.SUBTRACT)
    slab = VoxelVolume.from_generator(
        csg, 4, 100.0,
        material=Material(albedo=(0.25, 0.45, 0.85, 1.0), roughness=0.7,
                          metallic=0.1, texture_scale=(60.0, 60.0)))
    instances = [
        dict(volume=0, position=(40.0, -55.0, 10.0)),
        dict(volume=1, position=(-60.0, 60.0, 0.0),
             rotation=np.asarray(vq.from_euler_degrees(0.0, 25.0, 0.0),
                                 np.float32)),
    ]
    cam_pos = (330.0, 0.0, 50.0)
    cam_rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, -8.0))
    light_dir = np.asarray(vq.forward_vector(
        vq.from_euler_degrees(0.0, 35.0, -35.0)))
    point = dict(position=(150.0, -120.0, 120.0), color=(1.0, 0.7, 0.4, 1.0),
                 intensity=60.0, att_linear=0.05, att_exp=0.0005)
    spot = dict(position=(150.0, 120.0, 140.0), color=(0.4, 0.7, 1.0, 1.0),
                intensity=80.0, att_linear=0.05, att_exp=0.0005,
                rotation=np.asarray(vq.from_euler_degrees(0.0, -140.0, -30.0),
                                    np.float32), angle=50.0, falloff=25.0)
    env = _env_pattern()
    return (sphere, slab, instances, cam_pos, cam_rot, light_dir, point,
            spot, env)


def _np_scene(sphere, slab, instances, light_dir, point, spot, env,
              textures=None):
    rvols = [ref.Volume(sphere.sdf, sphere.resolution, sphere.extends),
             ref.Volume(slab.sdf, slab.resolution, slab.extends)]
    at, nt, rt = (None, None, None) if textures is None else textures
    insts = []
    for i, inst in enumerate(instances):
        vol = rvols[inst["volume"]]
        m = (sphere if inst["volume"] == 0 else slab).material
        insts.append(ref.InstanceNP(
            vol, position=inst.get("position", (0, 0, 0)),
            rotation=inst.get("rotation", (0, 0, 0, 1)),
            scale=inst.get("scale", (1, 1, 1)),
            tint=m.albedo[:3], roughness=m.roughness, metallic=m.metallic,
            albedo_tex=at, normal_tex=nt, rm_tex=rt,
            tex_scale=m.texture_scale))
    spot_fwd = np.asarray(vq.forward_vector(spot["rotation"]), np.float64)
    return ref.SceneNP(
        insts, env, dir_light_dir=light_dir, dir_light_strength=5.0,
        point_lights=[dict(position=point["position"],
                           color=point["color"][:3],
                           intensity=point["intensity"],
                           att_l=point["att_linear"],
                           att_exp=point["att_exp"])],
        spot_lights=[dict(position=spot["position"], forward=spot_fwd,
                          color=spot["color"][:3],
                          intensity=spot["intensity"],
                          att_l=spot["att_linear"],
                          att_exp=spot["att_exp"],
                          cos_angle=np.cos(np.deg2rad(spot["angle"]) / 2),
                          cos_falloff=np.cos(
                              np.deg2rad(spot["falloff"]) / 2))])


def _assert_cube_lit(got, np_scene, w, h, cam_pos, cam_rot, textured):
    """Cube-lit comparison with rounding-stability masking.

    In cube mode the shadow/reflection origin lands EXACTLY on a voxel
    boundary by construction (hit t = previous node exit + 0.1, origin =
    hit - 0.1*d, ``SH/Raytracing_Cube.hlsl``), so whether a secondary ray's
    start cell is the solid voxel is a rounding coin-flip — classic shadow
    acne the f32 reference exhibits too.  The oracle renders twice with the
    backoff perturbed +-1e-3; only pixels stable under the perturbation are
    compared (and they must be the large majority of the frame)."""
    a = ref.render_scene_np(np_scene, w, h, cam_pos, cam_rot, 60.0,
                            interp=False, lit=True, textured=textured,
                            shadow_backoff=0.1 - 1e-3)
    b = ref.render_scene_np(np_scene, w, h, cam_pos, cam_rot, 60.0,
                            interp=False, lit=True, textured=textured,
                            shadow_backoff=0.1 + 1e-3)
    stable = np.abs(a - b).max(axis=-1) < 1e-3
    # a reflective cube-mode scene keeps ~15% of pixels on the acne edge
    # (every solid-adjacent secondary ray starts on a cell face, and the
    # mirror bounce doubles the exposure) — the stable majority must match
    assert stable.mean() > 0.80, float(stable.mean())
    diff = np.abs(got - a).max(axis=-1)[stable]
    assert np.quantile(diff, 0.98) < 6e-3, float(np.quantile(diff, 0.98))
    assert (diff > 0.05).mean() < 0.005, float((diff > 0.05).mean())


def _assert_close(got, want, tag, q98=6e-3, mean=2.5e-3, outliers=0.005):
    diff = np.abs(got - want)
    assert np.quantile(diff, 0.98) < q98, (tag, float(np.quantile(diff,
                                                                  0.98)))
    assert diff.mean() < mean, (tag, float(diff.mean()))
    frac = float((diff.max(axis=-1) > 0.05).mean())
    assert frac < outliers, (tag, frac)


class TestGoldenAllModes:
    """Two-instance overlapping scene through all 8 EVRenderMode variants."""

    @pytest.fixture(scope="class")
    def setup(self):
        (sphere, slab, instances, cam_pos, cam_rot, light_dir, point, spot,
         env) = _scene_pair()
        scene = build_scene(
            [sphere, slab], instances,
            camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
            dir_light=dict(direction=light_dir, strength=5.0),
            point_lights=[point], spot_lights=[spot], env=env)
        np_scene = _np_scene(sphere, slab, instances, light_dir, point,
                             spot, env)
        return scene, np_scene, cam_pos, cam_rot

    @pytest.mark.parametrize("interp,lit", [(True, True), (True, False),
                                            (False, True), (False, False)])
    def test_notex_modes_64(self, setup, interp, lit):
        scene, np_scene, cam_pos, cam_rot = setup
        w = h = 64
        mode = RenderMode(interp=interp, lit=lit, textured=False)
        got = np.asarray(render_image(scene, w, h, mode))[..., :3]
        if interp or not lit:
            want = ref.render_scene_np(np_scene, w, h, cam_pos, cam_rot,
                                       60.0, interp=interp, lit=lit,
                                       textured=False)
            _assert_close(got, want, f"interp={interp} lit={lit}")
        else:
            _assert_cube_lit(got, np_scene, w, h, cam_pos, cam_rot,
                             textured=False)


class TestGoldenTextured:
    """Textured modes: checker albedo + rm + normal map, triplanar."""

    @pytest.fixture(scope="class")
    def setup(self):
        (sphere, slab, instances, cam_pos, cam_rot, light_dir, point, spot,
         env) = _scene_pair()
        albedo_tex = _checker(8, (1.0, 1.0, 1.0), (0.45, 0.45, 0.45))
        rm_tex = _checker(8, (1.0, 1.0, 0.0), (0.75, 0.5, 0.0))
        # gentle normal map (keep the perturbation small: the reference's
        # unnormalized world transform amplifies differences)
        normal_tex = np.full((8, 8, 3), (0.5, 0.5, 1.0), np.float32)
        normal_tex[::2, :, 0] = 0.58
        normal_tex[1::2, :, 1] = 0.42

        textures = np.stack([albedo_tex, normal_tex, rm_tex])
        tex_sizes = np.asarray([[8, 8]] * 3, np.int32)
        scene = build_scene(
            [sphere, slab], instances,
            camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
            dir_light=dict(direction=light_dir, strength=5.0),
            point_lights=[point], spot_lights=[spot], env=env,
            textures=textures, tex_sizes=tex_sizes,
            texture_ids=[(0, 1, 2), (0, 1, 2)])
        np_scene = _np_scene(sphere, slab, instances, light_dir, point,
                             spot, env,
                             textures=(albedo_tex, normal_tex, rm_tex))
        return scene, np_scene, cam_pos, cam_rot

    @pytest.mark.parametrize("interp,lit", [(True, True), (True, False),
                                            (False, True), (False, False)])
    def test_textured_modes_48(self, setup, interp, lit):
        scene, np_scene, cam_pos, cam_rot = setup
        w = h = 48
        mode = RenderMode(interp=interp, lit=lit, textured=True)
        got = np.asarray(render_image(scene, w, h, mode))[..., :3]
        if interp or not lit:
            want = ref.render_scene_np(np_scene, w, h, cam_pos, cam_rot,
                                       60.0, interp=interp, lit=lit,
                                       textured=True)
            _assert_close(got, want, f"tex interp={interp} lit={lit}")
        else:
            _assert_cube_lit(got, np_scene, w, h, cam_pos, cam_rot,
                             textured=True)


class TestGoldenBenchedConfig:
    """The BENCHED pipeline configuration against the oracle (VERDICT r4
    item 6): Chebyshev accel + bf16 fast-march corner table + the
    deferred-wavefront frame with mid-march compaction — the exact shape
    of the flagship bench rows (vrt/apps/bench.py) — must stay golden,
    not just the octree/f32/plain path the other tests cover.

    Tolerances are wider than the f32 tests: the bf16 corner table
    quantizes densities (comparable to the reference's 15-bit fixed-point
    volume encoding), shifting isosurface roots sub-cell.
    """

    def test_benched_flagship_config_64(self):
        import jax.numpy as jnp

        (sphere, slab, instances, cam_pos, cam_rot, light_dir, point, spot,
         env) = _scene_pair()
        scene = build_scene(
            [sphere, slab], instances,
            camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
            dir_light=dict(direction=light_dir, strength=5.0),
            point_lights=[point], spot_lights=[spot], env=env,
            accel_mode="chebyshev", march_dtype=jnp.bfloat16)
        np_scene = _np_scene(sphere, slab, instances, light_dir, point,
                             spot, env)
        w = h = 64
        got = np.asarray(render_image(scene, w, h, RenderMode(),
                                      chunk_size=256, sort_rays=True,
                                      compact=True))[..., :3]
        assert np.isfinite(got).all()
        want = ref.render_scene_np(np_scene, w, h, cam_pos, cam_rot, 60.0,
                                   interp=True, lit=True, textured=False)
        # bf16 quantization moves silhouette/shadow pixels; the stable
        # interior must match closely and gross outliers stay rare
        diff = np.abs(got - want)
        assert np.quantile(diff, 0.90) < 0.015, float(
            np.quantile(diff, 0.90))
        assert diff.mean() < 0.01, float(diff.mean())
        assert (diff.max(axis=-1) > 0.1).mean() < 0.03, float(
            (diff.max(axis=-1) > 0.1).mean())
