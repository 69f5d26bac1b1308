"""Coarse-to-fine fit utilities: upsample_params exact trilinear
refinement, psnr, and the traced-camera single-view fit step."""

import jax.numpy as jnp
import numpy as np

from vrt.diff.fit import make_fit_step_view, psnr, upsample_params


class TestUpsampleParams:
    def test_exact_trilinear_refinement(self):
        rng = np.random.default_rng(3)
        sdf = rng.normal(size=(1, 5, 5, 5)).astype(np.float32)
        up = np.asarray(upsample_params({"sdf": jnp.asarray(sdf)})["sdf"])
        assert up.shape == (1, 9, 9, 9)
        # even planes copy the coarse grid
        np.testing.assert_array_equal(up[:, ::2, ::2, ::2], sdf)
        # odd planes are the trilinear midpoints: compare the full result
        # against scipy-free linear interpolation along each axis
        want = sdf
        for ax in (1, 2, 3):
            n = want.shape[ax]
            lo = np.take(want, np.arange(n - 1), axis=ax)
            hi = np.take(want, np.arange(1, n), axis=ax)
            mid = 0.5 * (lo + hi)
            shape = list(want.shape)
            shape[ax] = 2 * n - 1
            out = np.zeros(shape, np.float32)
            sl = [slice(None)] * want.ndim
            sle, slo = list(sl), list(sl)
            sle[ax] = slice(0, 2 * n - 1, 2)
            slo[ax] = slice(1, 2 * n - 1, 2)
            out[tuple(sle)] = want
            out[tuple(slo)] = mid
            want = out
        np.testing.assert_allclose(up, want, rtol=0, atol=0)

    def test_colors_and_passthrough(self):
        rng = np.random.default_rng(4)
        p = {"voxel_colors": jnp.asarray(
                 rng.normal(size=(1, 3, 3, 3, 3)).astype(np.float32)),
             "cam_pos": jnp.asarray([1.0, 2.0, 3.0])}
        up = upsample_params(p)
        assert up["voxel_colors"].shape == (1, 5, 5, 5, 3)
        np.testing.assert_array_equal(np.asarray(up["cam_pos"]),
                                      [1.0, 2.0, 3.0])


class TestPSNR:
    def test_known_values(self):
        a = jnp.zeros((8, 3))
        assert float(psnr(a, a)) == 120.0  # clamp at mse 1e-12
        b = a.at[:].set(0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


class TestFitStepView:
    def test_one_compile_many_views(self):
        import optax

        from __graft_entry__ import _flagship_scene
        from vrt.render.gpuscene import RenderMode

        scene = _flagship_scene(resolution=3, use_colors=True)
        opt = optax.adam(1e-2)
        params = {"sdf": scene.volumes.sdf,
                  "voxel_colors": scene.voxel_colors}
        state = opt.init(params)
        step = make_fit_step_view(scene, 16, 16, RenderMode(), opt,
                                  chunk_size=None)
        tgt = jnp.zeros((256, 3))
        rots = [jnp.asarray([0.0, 0.0, 1.0, 0.0]),
                jnp.asarray([0.0, 0.0, 0.0, 1.0])]
        losses = []
        for i in range(3):
            params, state, loss = step(
                params, state, jnp.asarray([320.0, 0.0, 40.0]),
                rots[i % 2], jnp.asarray(60.0), tgt)
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        # different traced cameras -> different losses, no retrace needed
        assert losses[0] != losses[1]
        assert step._cache_size() == 1
