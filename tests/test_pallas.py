"""RETIRED Pallas march kernel vs the XLA march (interpret mode on CPU).

The kernel was demoted to ``scripts/pallas_march.py`` after the round-2
bake-off retired it from production (see its module docstring); this test
keeps the parity record executable.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from vrt.march.march import march_volume
from pallas_march import fits_in_vmem, march_volume_pallas  # noqa: E402
from vrt.march.types import DeviceVolume
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


@pytest.fixture(scope="module")
def volume():
    return DeviceVolume.from_volume(
        VoxelVolume.from_generator(S.Sphere(radius=50.0), 4, 100.0))


class TestPallasMarch:
    def test_fits_in_vmem(self, volume):
        assert fits_in_vmem(volume)

    def test_matches_xla_march(self, volume):
        rng = np.random.default_rng(0)
        r = 256
        dirs = rng.normal(size=(r, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        o = jnp.asarray(-dirs * 280.0
                        + rng.normal(scale=20, size=(r, 3)).astype(np.float32))
        d = jnp.asarray(dirs)
        tm = jnp.full(r, 1e4, jnp.float32)

        ref = march_volume(volume, o, d, tm)
        pk = march_volume_pallas(volume, o, d, tm, interpret=True)

        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(pk.hit))
        np.testing.assert_array_equal(np.asarray(ref.kind),
                                      np.asarray(pk.kind))
        both = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(ref.t)[both],
                                   np.asarray(pk.t)[both], rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(ref.cell)[both],
                                      np.asarray(pk.cell)[both])

    def test_padding_lanes(self, volume):
        # ray counts not divisible by the tile exercise the pad path
        o = jnp.asarray([[-300.0, 0.0, 0.0]] * 3)
        d = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
        tm = jnp.full(3, 1e4, jnp.float32)
        pk = march_volume_pallas(volume, o, d, tm, interpret=True)
        assert pk.hit.shape == (3,)
        assert bool(pk.hit[0])
