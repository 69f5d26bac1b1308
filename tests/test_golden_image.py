"""End-to-end golden image: vrt pipeline vs the independent NumPy
re-derivation of raygen + march + shadow + Cook-Torrance + tonemap."""

import numpy as np
import pytest

from tests import numpy_reference as ref
from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


class TestGoldenImage:
    def test_notex_lit_matches_numpy(self):
        vol = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 4, 100.0,
            material=Material(albedo=(0.8, 0.4, 0.3, 1.0), roughness=0.6,
                              metallic=0.2))
        cam_pos = (300.0, 0.0, 60.0)
        cam_rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, -10.0))
        light_dir = np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 30.0, -40.0)))
        env_color = (0.2, 0.3, 0.5)
        env = np.full((6, 2, 2, 3), env_color, np.float32)

        scene = build_scene(
            [vol], [{"volume": 0}],
            camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
            dir_light=dict(direction=light_dir, strength=5.0),
            env=env)
        w = h = 24
        got = np.asarray(render_image(scene, w, h,
                                      RenderMode(textured=False)))[..., :3]

        rvol = ref.Volume(vol.sdf, vol.resolution, vol.extends)
        want = ref.render_notex_lit(
            rvol, w, h, cam_pos, cam_rot, 60.0, light_dir, 5.0,
            np.asarray([0.8, 0.4, 0.3]), 0.6, 0.2, env_color)

        diff = np.abs(got - want)
        # allow a handful of boundary pixels to differ (f32 vs f64 bracket
        # edges); the bulk of the image must match tightly
        assert np.quantile(diff, 0.98) < 5e-3, np.quantile(diff, 0.98)
        assert diff.mean() < 2e-3, diff.mean()
        assert (diff.max(axis=-1) > 0.05).mean() < 0.01  # <1% outlier pixels
