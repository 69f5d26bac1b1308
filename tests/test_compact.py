"""Mid-march live-lane compaction (``march_lanes_compact`` /
``render_image(compact=True)``) must walk the same cells as the plain
march: discrete results (hit, kind, cell, steps) are exactly equal;
continuous t/normals agree to float ULP (the two programs compile with
different FMA contractions)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.march.march import march_lanes, march_lanes_compact
from vrt.march.types import DeviceVolume
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def _stacked_vols():
    sphere = VoxelVolume.from_generator(S.Sphere(radius=55.0), 5, 100.0)
    csg = S.CSG(shape=S.Box(extends=(45.0, 45.0, 45.0)))
    csg.add_child(S.Sphere(radius=52.0), S.SUBTRACT)
    box = VoxelVolume.from_generator(csg, 5, 100.0)
    dva = DeviceVolume.from_volume(sphere)
    dvb = DeviceVolume.from_volume(box)
    return jax.tree.map(lambda *x: jnp.stack(x), dva, dvb)


def _rays(L=1024, seed=7):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (-d * 260 + rng.normal(scale=40, size=(L, 3))).astype(np.float32)
    o[:100] = rng.uniform(-80, 80, size=(100, 3)).astype(np.float32)
    vol_ids = jnp.asarray(rng.integers(0, 2, L), jnp.int32)
    # mix of deactivated lanes (t_max -inf) like masked shadow batches
    t_max = jnp.where(jnp.arange(L) % 7 == 0, -jnp.inf,
                      1e4).astype(jnp.float32)
    return jnp.asarray(o), jnp.asarray(d), vol_ids, t_max


class TestCompactLaneMarch:
    @pytest.mark.parametrize("interp,block", [(True, None), (False, None),
                                              (True, 32), (False, 64)])
    def test_matches_plain_march(self, interp, block):
        vols = _stacked_vols()
        o, d, vol_ids, t_max = _rays()
        h0 = march_lanes(vols, vol_ids, o, d, t_max, interp=interp)
        h1 = march_lanes_compact(vols, vol_ids, o, d, t_max, interp=interp,
                                 chunk=128, schedule=(4, 12, 239),
                                 block=block)
        for f in ("hit", "kind", "cell", "steps"):
            np.testing.assert_array_equal(
                np.asarray(getattr(h0, f)), np.asarray(getattr(h1, f)),
                err_msg=f)
        hit = np.asarray(h0.hit)
        for f in ("t", "t_in", "t_out"):
            a = np.where(hit, np.asarray(getattr(h0, f)), 0.0)
            b = np.where(hit, np.asarray(getattr(h1, f)), 0.0)
            np.testing.assert_allclose(b, a, rtol=2e-6, atol=1e-4,
                                       err_msg=f)
        a = np.where(hit[:, None], np.asarray(h0.face_normal), 0.0)
        b = np.where(hit[:, None], np.asarray(h1.face_normal), 0.0)
        np.testing.assert_allclose(b, a, rtol=2e-6, atol=1e-5)

    def test_single_round_schedule(self):
        vols = _stacked_vols()
        o, d, vol_ids, t_max = _rays(L=512, seed=11)
        h0 = march_lanes(vols, vol_ids, o, d, t_max)
        h1 = march_lanes_compact(vols, vol_ids, o, d, t_max,
                                 chunk=256, schedule=(255,))
        np.testing.assert_array_equal(np.asarray(h0.hit),
                                      np.asarray(h1.hit))
        np.testing.assert_array_equal(np.asarray(h0.cell),
                                      np.asarray(h1.cell))

    def test_past_2_23_lanes(self):
        """4K-scale dispatches exceed 2^23 lanes (3840x2160 = 8.29M, plus
        chunk padding); the packed-meta order field must round-trip lane
        identity above bit 23 (VERDICT r4 item 7).  Live rays are placed at
        the TOP lane indices so their order codes exercise bit 23."""
        vols = _stacked_vols()
        n_live = 512
        o_l, d_l, vol_l, t_l = _rays(L=n_live, seed=13)
        total = (1 << 23) + 4096        # > 2^23, not a chunk multiple
        o = jnp.zeros((total, 3), jnp.float32)
        # dead filler: rays far out, t_max -inf -> slab test kills them
        o = o.at[-n_live:].set(o_l)
        d = jnp.ones((total, 3), jnp.float32)
        d = d.at[-n_live:].set(d_l)
        vol_ids = jnp.zeros(total, jnp.int32).at[-n_live:].set(vol_l)
        t_max = jnp.full(total, -jnp.inf).at[-n_live:].set(t_l)
        h0 = march_lanes(vols, vol_l, o_l, d_l, t_l)
        h1 = march_lanes_compact(vols, vol_ids, o, d, t_max,
                                 chunk=1 << 16)
        live = jax.tree.map(lambda x: np.asarray(x)[-n_live:], h1)
        np.testing.assert_array_equal(np.asarray(h0.hit), live.hit)
        np.testing.assert_array_equal(np.asarray(h0.kind), live.kind)
        np.testing.assert_array_equal(np.asarray(h0.cell), live.cell)
        hit = np.asarray(h0.hit)
        np.testing.assert_allclose(np.where(hit, live.t, 0.0),
                                   np.where(hit, np.asarray(h0.t), 0.0),
                                   rtol=2e-6, atol=1e-4)


class TestCompactRender:
    def _scene(self):
        sphere = VoxelVolume.from_generator(
            S.Sphere(radius=50.0), 4, 100.0,
            material=Material(albedo=(0.9, 0.2, 0.2, 1.0), roughness=0.1,
                              metallic=0.6))
        csg = S.CSG(shape=S.Box(extends=(40.0, 40.0, 40.0)))
        csg.add_child(S.Sphere(radius=50.0), S.SUBTRACT)
        box = VoxelVolume.from_generator(
            csg, 4, 100.0,
            material=Material(albedo=(0.2, 0.4, 0.9, 1.0), roughness=0.8))
        env = np.full((6, 4, 4, 3), (0.25, 0.45, 0.85), np.float32)
        return build_scene(
            [sphere, box],
            [{"volume": 0, "position": (0.0, -70.0, 0.0)},
             {"volume": 1, "position": (0.0, 90.0, 10.0),
              "rotation": np.asarray(vq.from_euler_degrees(0.0, 30.0, 0.0))}],
            camera={"position": (320.0, 0.0, 40.0),
                    "rotation": np.asarray(
                        vq.from_euler_degrees(0.0, 180.0, 0.0)),
                    "fov": 60.0},
            dir_light={"direction": np.asarray(vq.forward_vector(
                vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 6.0},
            point_lights=[{"position": (150.0, -40.0, 80.0),
                           "color": (1.0, 0.9, 0.8, 1.0),
                           "intensity": 600.0}],
            env=env)

    @pytest.mark.parametrize("mode", [RenderMode(),
                                      RenderMode(lit=False),
                                      RenderMode(interp=False),
                                      RenderMode(debug_overlay=True)])
    def test_full_pipeline_matches(self, mode):
        scene = self._scene()
        img0 = np.asarray(render_image(scene, 64, 48, mode,
                                       chunk_size=256, sort_rays=True))
        img1 = np.asarray(render_image(scene, 64, 48, mode,
                                       chunk_size=256, sort_rays=True,
                                       compact=True))
        assert np.isfinite(img1).all()
        if mode.debug_overlay:
            # the overlay tests |pos - node_edge| <= 0.5: ULP-level t
            # differences between the two compilations flip pixels on the
            # band edge — allow a small flipped fraction
            assert (np.abs(img1 - img0) > 2e-4).mean() < 0.02
        else:
            # post-tonemap pixels; ULP-level march t differences only
            np.testing.assert_allclose(img1, img0, rtol=0, atol=2e-4)
            assert (np.abs(img1 - img0) > 1e-6).mean() < 0.02

    def test_compact_remat_grads(self):
        """compact composes with the differentiable remat path."""
        scene = self._scene()
        scene = dataclasses.replace(
            scene, voxel_colors=jnp.full(
                (2,) + scene.volumes.sdf.shape[1:] + (3,), 0.5),
            use_voxel_colors=True)

        def loss(colors, compact):
            s = dataclasses.replace(scene, voxel_colors=colors)
            img = render_image(s, 48, 32, RenderMode(), chunk_size=256,
                               sort_rays=True, remat=True,
                               compact=compact)[..., :3]
            return jnp.mean(img ** 2)

        g0 = jax.grad(lambda c: loss(c, False))(scene.voxel_colors)
        g1 = jax.grad(lambda c: loss(c, True))(scene.voxel_colors)
        assert np.isfinite(np.asarray(g1)).all()
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-3, atol=1e-7)
