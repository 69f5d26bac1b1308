"""The PRODUCTION pipeline over slab shards == the replicated pipeline.

VERDICT r2 item 3's acceptance: sharded full-pipeline image (instances,
shadows, bounce, Cook-Torrance, env miss, tonemap) equals the replicated
image at S=4 and S=8 — not a toy shade.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.dist.brick import shard_volume
from vrt.dist.mesh import make_render_mesh
from vrt.dist.slab_render import render_slab_image
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.render.renderer import render_image
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

W = H = 48


def _scene_and_volume(reflective=False):
    csg = S.CSG(shape=S.Sphere(radius=55.0))
    csg.add_child(S.Box(extends=(70.0, 25.0, 25.0),
                        position=np.array([0.0, 0.0, 40.0], np.float32)),
                  S.ADD)
    mat = Material(albedo=(0.8, 0.45, 0.25, 1.0),
                   roughness=0.12 if reflective else 0.7,
                   metallic=0.5 if reflective else 0.0)
    vol = VoxelVolume.from_generator(csg, 5, 100.0, material=mat)
    env = np.zeros((6, 4, 4, 3), np.float32)
    env[:] = (0.25, 0.45, 0.85)
    scene = build_scene(
        [vol], [{"volume": 0}],
        camera={"position": (300.0, 40.0, 60.0),
                "rotation": np.asarray(vq.from_euler_degrees(0.0, 180.0,
                                                             -10.0))},
        dir_light={"direction": np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 6.0},
        env=env)
    return scene, vol


def _compare(img_ref, img_sh, vol, max_band=0.25):
    """Interior hits are bitwise-equal; only slab-boundary-cell hits may
    shift sub-cell (bracket start — and in cube mode the entering-face
    normal of the first owned voxel after a giant-node crossing can pick
    the boundary plane's axis on diagonal-bias crossings), so the pixel
    population must match to high quantile with a small outlier budget."""
    a = np.asarray(img_ref[..., :3])
    b = np.asarray(img_sh[..., :3])
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 1e-5).mean() > 0.97, (diff.mean(), (diff >= 1e-5).mean())
    if max_band is not None:
        assert diff.max() < max_band, diff.max()
    assert (diff > 0.25).mean() < 0.01, (diff > 0.25).mean()


@pytest.mark.parametrize("s_count", [4, 8])
def test_full_pipeline_matches_replicated(s_count):
    scene, vol = _scene_and_volume()
    img_ref = jax.jit(lambda s: render_image(s, W, H, RenderMode()))(scene)

    mesh = make_render_mesh(1, s_count)
    slabs = shard_volume(vol, s_count)
    img_sh = render_slab_image(scene, slabs, mesh, W, H, RenderMode())
    _compare(img_ref, img_sh, vol)


def test_reflective_bounce_through_slabs():
    # roughness < 0.3 -> the mirror-bounce rays also march the slabs
    scene, vol = _scene_and_volume(reflective=True)
    assert scene.any_reflective
    img_ref = jax.jit(lambda s: render_image(s, W, H, RenderMode()))(scene)

    mesh = make_render_mesh(1, 4)
    slabs = shard_volume(vol, 4)
    img_sh = render_slab_image(scene, slabs, mesh, W, H, RenderMode())
    _compare(img_ref, img_sh, vol)


def test_cube_mode_through_slabs():
    scene, vol = _scene_and_volume()
    mode = RenderMode(interp=False)
    img_ref = jax.jit(lambda s: render_image(s, W, H, mode))(scene)

    mesh = make_render_mesh(1, 4)
    slabs = shard_volume(vol, 4)
    img_sh = render_slab_image(scene, slabs, mesh, W, H, mode)
    _compare(img_ref, img_sh, vol, max_band=None)


def test_chebyshev_slabs_match():
    scene, vol = _scene_and_volume()
    img_ref = jax.jit(lambda s: render_image(s, W, H, RenderMode()))(scene)

    mesh = make_render_mesh(1, 4)
    slabs = shard_volume(vol, 4, accel_mode="chebyshev")
    img_sh = render_slab_image(scene, slabs, mesh, W, H, RenderMode())
    _compare(img_ref, img_sh, vol)
