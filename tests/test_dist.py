"""Multi-device: sharded rendering equivalence + DP fit step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.dist.mesh import make_render_mesh
from vrt.dist.sharding import make_fit_step_dp, render_image_sharded
from vrt.render.camera import camera_rays
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _scene(use_colors=False):
    vol = VoxelVolume.from_generator(
        S.Sphere(radius=50.0), 4, 100.0,
        material=Material(albedo=(0.8, 0.3, 0.2, 1.0), roughness=0.8))
    colors = None
    if use_colors:
        n = vol.n_voxels
        colors = np.full((1, n, n, n, 3), 0.5, np.float32)
    env = np.full((6, 2, 2, 3), (0.3, 0.4, 0.6), np.float32)
    return build_scene(
        [vol], [{"volume": 0}],
        camera={"position": (300.0, 0.0, 0.0),
                "rotation": np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                "fov": 60.0},
        dir_light={"direction": np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 4.0},
        env=env, voxel_colors=colors)


class TestShardedRender:
    def test_matches_single_device(self):
        scene = _scene()
        mode = RenderMode()
        img1 = np.asarray(render_image(scene, 16, 16, mode))
        for shape in [(8, 1), (4, 2)]:
            mesh = make_render_mesh(shape[0], shape[1])
            img2 = np.asarray(render_image_sharded(scene, 16, 16, mode, mesh))
            assert np.allclose(img1, img2, atol=1e-5), shape

    def test_nondivisible_ray_count(self):
        scene = _scene()
        mesh = make_render_mesh(8, 1)
        # 15*15 = 225 rays, not divisible by 8 -> exercises padding
        img1 = np.asarray(render_image(scene, 15, 15, RenderMode()))
        img2 = np.asarray(render_image_sharded(scene, 15, 15, RenderMode(),
                                               mesh))
        assert np.allclose(img1, img2, atol=1e-5)


class TestDPFit:
    def test_step_reduces_loss_and_matches_grads(self):
        scene = _scene(use_colors=True)
        mesh = make_render_mesh(4, 2)
        mode = RenderMode()
        o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, 16, 16)
        targets = jnp.zeros((256, 3), jnp.float32)

        params = {"voxel_colors": scene.voxel_colors}
        optimizer = optax.sgd(1e-2)
        opt_state = optimizer.init(params)
        step = make_fit_step_dp(mode, mesh, optimizer)
        p1, opt_state, l1 = step(params, opt_state, scene, o, d, targets)
        p2, opt_state, l2 = step(p1, opt_state, scene, o, d, targets)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        assert float(l2) < float(l1)

    def test_dp_grads_match_single_device(self):
        scene = _scene(use_colors=True)
        mode = RenderMode()
        o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov, 16, 16)
        targets = jnp.zeros((256, 3), jnp.float32)

        from vrt.diff.fit import graft_params, rebuild_accel
        from vrt.render.renderer import tonemap, trace_radiance

        def single_loss(p):
            s = rebuild_accel(graft_params(scene, p))
            rgb = trace_radiance(s, o, d, 0, mode)
            return jnp.sum((tonemap(rgb) - targets) ** 2)

        params = {"voxel_colors": scene.voxel_colors}
        g_single = jax.grad(single_loss)(params)

        mesh = make_render_mesh(8, 1)
        from vrt.dist.sharding import make_loss_and_grad_dp
        loss_and_grad = make_loss_and_grad_dp(mode, mesh)
        scene_r = rebuild_accel(graft_params(scene, params))
        _, g_dp = jax.jit(loss_and_grad)(params, scene_r, o, d, targets)
        np.testing.assert_allclose(
            np.asarray(g_dp["voxel_colors"]),
            np.asarray(g_single["voxel_colors"]), rtol=1e-4, atol=1e-6)


class TestMeshHelpers:
    def test_make_render_mesh_shapes_and_names(self):
        mesh = make_render_mesh(4, 2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)
        with pytest.raises(ValueError):
            make_render_mesh(16, 2)  # more devices than exist

    def test_local_mesh_shape(self):
        from vrt.dist.mesh import local_mesh_shape
        n_data, n_model = local_mesh_shape(2)
        assert n_data * n_model == len(jax.devices())
        assert n_model == 2

    def test_init_distributed_idempotent(self):
        from vrt.dist.mesh import init_distributed
        # single-process: initialize raises RuntimeError internally and the
        # helper swallows it; calling twice must not raise
        init_distributed()
        init_distributed()
