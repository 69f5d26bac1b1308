"""Slab-sharded volume march: equivalence with the replicated march."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vrt.dist.brick import (HALO, combine_hits, exchange_halos,
                            march_volume_slab, shard_volume)
from vrt.dist.mesh import make_render_mesh
from vrt.march.march import march_volume
from vrt.march.resolve import resolve_volume_hits
from vrt.march.types import DeviceVolume
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _volume():
    csg = S.CSG(shape=S.Sphere(radius=55.0))
    csg.add_child(S.Box(extends=(70.0, 25.0, 25.0),
                        position=np.array([0.0, 0.0, 40.0], np.float32)),
                  S.ADD)
    return VoxelVolume.from_generator(csg, 5, 100.0)


def _rays(n=128, seed=3):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = (-dirs * rng.uniform(150.0, 320.0, size=(n, 1))).astype(np.float32)
    o += rng.normal(scale=30.0, size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(dirs)


class TestShardVolume:
    def test_slab_layout(self):
        vol = _volume()
        slabs = shard_volume(vol, 4)
        assert slabs.sdf.shape == (4, 8 + 1 + 2 * HALO, 33, 33)
        assert slabs.accel.shape == (4, 8, 32, 32)
        # owned planes carry the actual sdf values
        for s in range(4):
            x0 = int(slabs.x_voxel0[s])
            lo = max(0, x0)
            off = lo - x0
            np.testing.assert_array_equal(
                np.asarray(slabs.sdf[s, off:off + 4]), vol.sdf[lo:lo + 4])

    def test_sharded_march_matches_replicated(self):
        vol = _volume()
        dv = DeviceVolume.from_volume(vol)
        o, d = _rays(128)
        tm = jnp.full(128, 1e4, jnp.float32)

        ref = march_volume(dv, o, d, tm)
        t_ref, n_ref, _ = resolve_volume_hits(dv, o, d, ref)

        mesh = make_render_mesh(1, 4)
        slabs = shard_volume(vol, 4)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("model"), P(), P(), P()), out_specs=P())
        def run(slabs, o, d, tm):
            slab = jax.tree.map(lambda x: x[0], slabs)
            hit = march_volume_slab(slab, o, d, tm)
            return combine_hits(hit, "model")

        hit = jax.jit(run)(slabs, o, d, tm)

        hits_ref = np.asarray(ref.hit)
        hits_sh = np.asarray(hit.hit)
        agree = hits_ref == hits_sh
        assert agree.mean() > 0.99, (hits_ref.sum(), hits_sh.sum())
        both = hits_ref & hits_sh
        t_r = np.asarray(ref.t)[both]
        t_s = np.asarray(hit.t)[both]
        # sub-cell bracket-start deviation at slab boundaries only
        assert np.abs(t_r - t_s).max() < vol.cell_size * 0.5
        same_cell = np.all(np.asarray(ref.cell)[both]
                           == np.asarray(hit.cell)[both], axis=1)
        assert same_cell.mean() > 0.98

    def test_interior_rays_bitwise_equal(self):
        # rays whose hits are far from slab boundaries resolve identically
        vol = _volume()
        dv = DeviceVolume.from_volume(vol)
        # head-on rays along +x hit the sphere's -x face around cell x~5..8
        ys = np.linspace(-30, 30, 16).astype(np.float32)
        o = np.stack([np.full(16, -300.0), ys, np.zeros(16)], 1)
        d = np.tile(np.array([[1.0, 0, 0]], np.float32), (16, 1))
        tm = jnp.full(16, 1e4, jnp.float32)
        ref = march_volume(dv, jnp.asarray(o), jnp.asarray(d), tm)

        mesh = make_render_mesh(1, 4)
        slabs = shard_volume(vol, 4)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("model"), P(), P(), P()), out_specs=P())
        def run(slabs, o, d, tm):
            slab = jax.tree.map(lambda x: x[0], slabs)
            return combine_hits(march_volume_slab(slab, o, d, tm), "model")

        hit = jax.jit(run)(slabs, jnp.asarray(o), jnp.asarray(d), tm)
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(hit.hit))
        np.testing.assert_allclose(np.asarray(ref.t), np.asarray(hit.t),
                                   rtol=1e-6)


class TestHaloExchange:
    def test_refresh_after_update(self):
        vol = _volume()
        mesh = make_render_mesh(1, 4)
        slabs = shard_volume(vol, 4)

        # perturb every slab's owned planes, then exchange halos
        rng = np.random.default_rng(0)
        delta = rng.normal(scale=0.5, size=np.asarray(slabs.sdf).shape
                           ).astype(np.float32)
        perturbed = dataclasses.replace(slabs, sdf=slabs.sdf + delta)

        @partial(jax.shard_map, mesh=mesh, in_specs=(P("model"),),
                 out_specs=P("model"))
        def refresh(slabs):
            slab = jax.tree.map(lambda x: x[0], slabs)
            out = exchange_halos(slab, "model")
            return jax.tree.map(lambda x: x[None], out)

        refreshed = jax.jit(refresh)(perturbed)

        # each slab's halo planes must now equal the neighbor's owned
        # planes AT THE SAME GLOBAL x: slot j of shard s holds global plane
        # x_voxel0[s] + j, so my left-halo slots [0, HALO) are the left
        # neighbor's owned slots [span-2H-1, span-H-1) and my right-halo
        # slots [span-H, span) its slots [H+1, 2H+1).
        sdf = np.asarray(refreshed.sdf)
        own = np.asarray(perturbed.sdf)
        span = sdf.shape[1]
        for s in range(4):
            if s > 0:  # left halo from the left neighbor's last owned planes
                np.testing.assert_array_equal(
                    sdf[s, :HALO],
                    own[s - 1, span - 2 * HALO - 1:span - HALO - 1])
            if s < 3:  # right halo from the right neighbor's first owned
                np.testing.assert_array_equal(
                    sdf[s, span - HALO:],
                    own[s + 1, HALO + 1:2 * HALO + 1])
        # global-plane correspondence: halo slot j of shard s and the
        # neighbor slot it came from name the same global plane
        for s in range(1, 4):
            x0 = int(np.asarray(perturbed.x_voxel0)[s])
            x0l = int(np.asarray(perturbed.x_voxel0)[s - 1])
            assert x0 + 0 == x0l + (span - 2 * HALO - 1)


class TestSlabFit:
    def test_model_parallel_fit_reduces_loss(self):
        import optax
        from vrt.dist.slab_render import (SlabTracer, default_fit_scene,
                                          make_slab_fit_step)
        from vrt.core import quat as vq
        from vrt.render.gpuscene import RenderMode
        from vrt.render.renderer import tonemap, trace_radiance

        target_vol = _volume()
        slabs_t = shard_volume(target_vol, 4)
        mesh = make_render_mesh(1, 4)

        # rays: a front-facing pixel grid.  32x32 (not coarser): with hard
        # visibility, a pixel whose hit/miss status flips under the
        # perturbation has no gradient path, and at 16x16 a single stuck
        # grazing pixel dominates the mean pixel loss.
        from vrt.render.camera import camera_rays
        o, d = camera_rays(jnp.asarray([300.0, 0.0, 0.0]),
                           jnp.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                           jnp.asarray(60.0), 32, 32)
        light = np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0)), np.float32)

        scene = default_fit_scene(target_vol.n_voxels, target_vol.cell_size,
                                  target_vol.extends, light)
        mode = RenderMode()
        optimizer = optax.adam(0.1)
        step = make_slab_fit_step(mesh, optimizer, scene, mode)

        # target image: the PRODUCTION forward (shadows and all) on the
        # true SDF, through the same sharded tracer
        from jax.sharding import PartitionSpec as P
        from functools import partial

        @partial(jax.shard_map, mesh=mesh, in_specs=(P("model"), P(), P()),
                 out_specs=P())
        def forward(slabs, o, d):
            s = jax.tree.map(lambda x: x[0], slabs)
            rgb = trace_radiance(scene, o, d, 0, mode,
                                 tracer=SlabTracer(s, "model"))
            size = jax.lax.axis_size("model")
            return jax.lax.psum(tonemap(rgb) / size, "model")

        targets = jax.jit(forward)(slabs_t, o, d)

        # start: perturbed volume
        rng = np.random.default_rng(0)
        pert = target_vol.sdf + rng.normal(
            scale=1.5, size=target_vol.sdf.shape).astype(np.float32)
        start_vol = VoxelVolume(target_vol.resolution, target_vol.extends,
                                sdf=pert)
        slabs = shard_volume(start_vol, 4)
        params = slabs.sdf
        opt_state = optimizer.init(params)

        losses = []
        start_sdf = np.asarray(start_vol.sdf)
        # short epochs: progress gates on the epoch-boundary accel resync
        # (stale topology caps how far the surface can move between syncs)
        for epoch in range(4):
            for _ in range(10):
                params, opt_state, loss = step(params, opt_state, slabs, o,
                                               d, targets)
                losses.append(float(loss))
            # epoch resync: gather owned planes to the host, rebuild the
            # (stale) accel topology, reshard (the documented workflow)
            planes = np.asarray(params)
            full = start_sdf.copy()
            span = planes.shape[1]
            for si in range(4):
                x0 = int(slabs.x_voxel0[si])
                lo, hi = int(slabs.cell_lo[si]), int(slabs.cell_hi[si]) + 1
                full[lo:hi] = planes[si, lo - x0:hi - x0]
            vol_now = VoxelVolume(target_vol.resolution, target_vol.extends,
                                  sdf=full)
            slabs = shard_volume(vol_now, 4)
            params = slabs.sdf
        assert np.isfinite(losses).all()
        # production Cook-Torrance shading (one-sided n.l, shadow masks)
        # carries weaker gradients than the retired wrap-lit lambert shade,
        # so convergence is slower; descent must still be decisive.  The
        # epoch-boundary accel resync can bounce the loss (hits re-route
        # through the rebuilt topology), so the floor is asserted on min.
        assert min(losses) < 0.45 * losses[0], losses[::10]
        assert losses[-1] < 0.85 * losses[0], losses[::10]

    def test_boundary_gradients_flow_through_halos(self):
        # gradients must reach owned planes that neighbors consume as halos
        import optax
        from vrt.dist.slab_render import default_fit_scene, make_slab_fit_step
        from vrt.core import quat as vq
        from vrt.render.camera import camera_rays

        vol = _volume()
        slabs = shard_volume(vol, 4)
        mesh = make_render_mesh(1, 4)
        o, d = camera_rays(jnp.asarray([300.0, 0.0, 0.0]),
                           jnp.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0)),
                           jnp.asarray(60.0), 12, 12)
        light = np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0)), np.float32)
        scene = default_fit_scene(vol.n_voxels, vol.cell_size, vol.extends,
                                  light)
        optimizer = optax.sgd(1e-2)
        step = make_slab_fit_step(mesh, optimizer, scene)
        params0 = slabs.sdf
        state = optimizer.init(params0)
        params1, _, loss = step(params0, state, slabs, o, d,
                                jnp.zeros((144, 3)))
        delta = np.abs(np.asarray(params1 - params0))
        assert np.isfinite(float(loss))
        # updates on several shards (the sphere spans multiple slabs)
        moved_per_shard = delta.reshape(4, -1).max(axis=1)
        assert (moved_per_shard > 0).sum() >= 2, moved_per_shard


class TestResync:
    def test_assemble_roundtrip(self):
        from vrt.dist.brick import assemble_full_sdf
        vol = _volume()
        slabs = shard_volume(vol, 4)
        full = np.asarray(assemble_full_sdf(slabs))
        np.testing.assert_array_equal(full, np.asarray(vol.sdf))

    def test_resync_matches_fresh_shard(self):
        """Perturb the sharded SDF, resync, compare against shard_volume of
        the assembled geometry (accel + sdf + layout all equal)."""
        from vrt.dist.brick import assemble_full_sdf, resync_slabs
        vol = _volume()
        slabs = shard_volume(vol, 4)
        rng = np.random.default_rng(11)
        bumped = (np.asarray(slabs.sdf)
                  + rng.normal(scale=3.0, size=slabs.sdf.shape)
                  .astype(np.float32))
        slabs = dataclasses.replace(slabs, sdf=jnp.asarray(bumped))

        resynced = resync_slabs(slabs, vol.resolution)

        full = np.asarray(assemble_full_sdf(slabs))
        fresh_vol = VoxelVolume(vol.resolution, vol.extends, sdf=full)
        fresh = shard_volume(fresh_vol, 4)
        np.testing.assert_array_equal(np.asarray(resynced.accel),
                                      np.asarray(fresh.accel))
        np.testing.assert_array_equal(np.asarray(resynced.sdf),
                                      np.asarray(fresh.sdf))
        for f in ("x_voxel0", "cell_lo", "cell_hi", "n"):
            np.testing.assert_array_equal(np.asarray(getattr(resynced, f)),
                                          np.asarray(getattr(fresh, f)))

    def test_resync_then_march_matches_replicated(self):
        from vrt.dist.brick import assemble_full_sdf, resync_slabs
        vol = _volume()
        slabs = shard_volume(vol, 4)
        rng = np.random.default_rng(5)
        bumped = (np.asarray(slabs.sdf)
                  + rng.normal(scale=2.0, size=slabs.sdf.shape)
                  .astype(np.float32))
        slabs = resync_slabs(
            dataclasses.replace(slabs, sdf=jnp.asarray(bumped)),
            vol.resolution)

        full = np.asarray(assemble_full_sdf(slabs))
        dv = DeviceVolume.from_volume(
            VoxelVolume(vol.resolution, vol.extends, sdf=full))
        o, d = _rays(96, seed=8)
        tm = jnp.full(96, 1e4, jnp.float32)
        ref = march_volume(dv, o, d, tm)

        mesh = make_render_mesh(1, 8)
        from vrt.dist.mesh import MODEL_AXIS

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(MODEL_AXIS), P(), P(), P()),
                 out_specs=P())
        def sharded(slabs, o, d, tm):
            slab = jax.tree.map(lambda x: x[0], slabs)
            hit = march_volume_slab(slab, o, d, tm)
            return combine_hits(hit, MODEL_AXIS)

        slabs8 = shard_volume(
            VoxelVolume(vol.resolution, vol.extends, sdf=full), 8)
        got = sharded(slabs8, o, d, tm)
        np.testing.assert_array_equal(np.asarray(got.hit),
                                      np.asarray(ref.hit))
        h = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[h],
                                   np.asarray(ref.t)[h], rtol=1e-5)
