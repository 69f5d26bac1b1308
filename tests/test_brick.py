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

        # each slab's halo planes must now equal the neighbor's owned planes
        sdf = np.asarray(refreshed.sdf)
        own = np.asarray(perturbed.sdf)
        span = sdf.shape[1]
        for s in range(4):
            if s > 0:  # left halo from the left neighbor's last owned planes
                np.testing.assert_array_equal(
                    sdf[s, :HALO],
                    own[s - 1, span - 2 * HALO:span - HALO])
            if s < 3:  # right halo from the right neighbor's first owned
                np.testing.assert_array_equal(
                    sdf[s, span - HALO:],
                    own[s + 1, HALO:2 * HALO])
