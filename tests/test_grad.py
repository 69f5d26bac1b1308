"""Gradient correctness: IFT-at-the-root vs central finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.diff.fit import graft_params, make_fit_step, rebuild_accel
from vrt.march.march import march_volume
from vrt.march.resolve import resolve_volume_hits
from vrt.march.types import DeviceVolume
from vrt.render.camera import camera_rays
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import tonemap, trace_radiance
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def _sphere_scene(resolution=4, radius=50.0, use_colors=False, albedo=(0.8, 0.3, 0.3, 1.0)):
    vol = VoxelVolume.from_generator(
        S.Sphere(radius=radius), resolution, 100.0,
        material=Material(albedo=albedo, roughness=0.8))
    colors = None
    if use_colors:
        n = vol.n_voxels
        rng = np.random.default_rng(0)
        colors = rng.uniform(0.2, 0.8, size=(1, n, n, n, 3)).astype(np.float32)
    return build_scene(
        [vol], [{"volume": 0}],
        camera={"position": (300.0, 0.0, 0.0),
                "rotation": np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                "fov": 60.0},
        dir_light={"direction": np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 3.0},
        voxel_colors=colors)


class TestHitTGradient:
    """d t_hit / d sdf against finite differences of the *whole march*."""

    def test_ift_matches_finite_difference(self):
        vol = VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0)
        dv = DeviceVolume.from_volume(vol)
        rng = np.random.default_rng(5)
        dirs = rng.normal(size=(6, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        o = jnp.asarray((-dirs * 280.0))
        d = jnp.asarray(dirs)
        tm = jnp.full(6, 1e4, jnp.float32)

        def t_sum(sdf):
            dv2 = DeviceVolume(sdf=sdf, materials=dv.materials,
                               accel=dv.accel, n=dv.n,
                               cell_size=dv.cell_size, extends=dv.extends)
            hit = march_volume(dv2, o, d, tm)
            t, _, _ = resolve_volume_hits(dv2, o, d, hit)
            return jnp.sum(jnp.where(hit.hit, t, 0.0))

        g = jax.grad(t_sum)(dv.sdf)
        g = np.asarray(g)
        nz = np.argwhere(np.abs(g) > 1e-4)
        assert len(nz) >= 8, "expected gradient on hit-cell corners"

        # central finite differences on the 5 largest-|g| voxels
        order = np.argsort(-np.abs(g).ravel())[:5]
        eps = 0.05
        base = np.asarray(dv.sdf)
        for flat_idx in order:
            idx = np.unravel_index(flat_idx, g.shape)
            p = base.copy()
            p[idx] += eps
            m = base.copy()
            m[idx] -= eps
            fd = (float(t_sum(jnp.asarray(p))) - float(t_sum(jnp.asarray(m)))) / (2 * eps)
            assert fd == pytest.approx(float(g[idx]), rel=0.08, abs=1e-3), idx


class TestPixelGradients:
    def _loss_fn(self, scene, width=24, height=24, mode=RenderMode()):
        o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                           width, height)

        def loss(params):
            s = rebuild_accel(graft_params(scene, params))
            rgb = trace_radiance(s, o, d, 0, mode)
            return jnp.sum(tonemap(rgb) ** 2)

        return loss

    def test_sdf_pixel_grad_vs_fd(self):
        scene = _sphere_scene(resolution=3)
        loss = self._loss_fn(scene)
        params = {"sdf": scene.volumes.sdf}
        val, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        g = np.asarray(g["sdf"])
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 1e-5

        base = np.asarray(scene.volumes.sdf)
        order = np.argsort(-np.abs(g).ravel())[:3]
        eps = 0.1
        for flat_idx in order:
            idx = np.unravel_index(flat_idx, g.shape)
            p = base.copy()
            p[idx] += eps
            m = base.copy()
            m[idx] -= eps
            fd = (float(loss({"sdf": jnp.asarray(p)}))
                  - float(loss({"sdf": jnp.asarray(m)}))) / (2 * eps)
            # FD crosses cell-topology changes the IFT gradient ignores;
            # require agreement within 15% on the dominant entries.
            assert fd == pytest.approx(float(g[idx]), rel=0.15, abs=5e-4), idx

    def test_voxel_color_grad_vs_fd(self):
        scene = _sphere_scene(resolution=3, use_colors=True)
        loss = self._loss_fn(scene)
        params = {"voxel_colors": scene.voxel_colors}
        g = np.asarray(jax.grad(loss)(params)["voxel_colors"])
        assert np.isfinite(g).all() and np.abs(g).max() > 1e-6
        base = np.asarray(scene.voxel_colors)
        flat_idx = int(np.argmax(np.abs(g)))
        idx = np.unravel_index(flat_idx, g.shape)
        eps = 0.05
        p = base.copy()
        p[idx] += eps
        m = base.copy()
        m[idx] -= eps
        fd = (float(loss({"voxel_colors": jnp.asarray(p)}))
              - float(loss({"voxel_colors": jnp.asarray(m)}))) / (2 * eps)
        assert fd == pytest.approx(float(g[idx]), rel=0.05, abs=1e-5)

    def test_camera_pos_grad_vs_fd(self):
        scene = _sphere_scene(resolution=3)
        loss = self._loss_fn(scene)
        g = np.asarray(jax.grad(loss)({"cam_pos": scene.cam_pos})["cam_pos"])
        assert np.isfinite(g).all()
        base = np.asarray(scene.cam_pos)
        eps = 0.5
        for axis in range(3):
            p = base.copy()
            p[axis] += eps
            m = base.copy()
            m[axis] -= eps
            fd = (float(loss({"cam_pos": jnp.asarray(p)}))
                  - float(loss({"cam_pos": jnp.asarray(m)}))) / (2 * eps)
            # camera grads are only the IFT/shading part (traversal cell
            # choices are stop-grad); allow loose agreement
            if abs(fd) > 1e-3:
                assert np.sign(fd) == np.sign(g[axis]) or \
                    fd == pytest.approx(float(g[axis]), rel=0.5, abs=2e-3)

    def test_tint_grad(self):
        scene = _sphere_scene(resolution=3)
        loss = self._loss_fn(scene)
        g = np.asarray(jax.grad(loss)({"tint": scene.tint})["tint"])
        assert np.isfinite(g).all() and np.abs(g).max() > 1e-4


class TestDeferredFitGrads:
    """The chunked fit path runs the PRODUCTION deferred wavefront pipeline
    (render_image with remat=True) — its loss and gradients must match the
    inline trace_radiance path (the deferral is exact by linearity)."""

    def test_chunked_wavefront_grads_match_inline(self):
        # reflective material so the deferred bounce pass is live, plus the
        # combined shadow pass and cond-skipped sky chunks
        scene = _sphere_scene(resolution=3, use_colors=True,
                              albedo=(0.8, 0.3, 0.3, 1.0))
        import dataclasses
        scene = dataclasses.replace(
            scene, roughness=jnp.full_like(scene.roughness, 0.1),
            any_reflective=True)
        from vrt.diff.fit import render_views
        cams = [dict(position=(300.0, 0.0, 0.0),
                     rotation=np.asarray(
                         vq.from_euler_degrees(0.0, 180.0, 0.0)),
                     fov=60.0)]
        params = {"sdf": scene.volumes.sdf,
                  "voxel_colors": scene.voxel_colors}

        def make_loss(chunk):
            def loss(p):
                s = rebuild_accel(graft_params(scene, p))
                imgs = render_views(s, cams, 24, 24, RenderMode(),
                                    chunk_size=chunk)
                return jnp.mean(imgs ** 2)
            return loss

        l0, g0 = jax.value_and_grad(make_loss(None))(params)
        l1, g1 = jax.value_and_grad(make_loss(128))(params)
        assert float(l0) == pytest.approx(float(l1), rel=1e-5)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            assert np.isfinite(b).all(), k
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7,
                                       err_msg=k)


class TestFitConverges:
    def test_recover_voxel_colors(self):
        # render a target with known colors, re-fit from gray start
        target_scene = _sphere_scene(resolution=3, use_colors=True)
        cams = [dict(position=(300.0, 0.0, 0.0),
                     rotation=np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                     fov=60.0)]
        from vrt.diff.fit import render_views
        targets = render_views(target_scene, cams, 24, 24, RenderMode())

        start = jnp.full_like(target_scene.voxel_colors, 0.5)
        scene = target_scene
        import optax
        params = {"voxel_colors": start}
        optimizer = optax.adam(5e-2)
        opt_state = optimizer.init(params)
        step = make_fit_step(scene, cams, 24, 24, RenderMode(), optimizer)
        losses = []
        for _ in range(30):
            params, opt_state, l = step(params, opt_state, targets)
            losses.append(float(l))
        assert losses[-1] < 0.25 * losses[0], losses[::10]
