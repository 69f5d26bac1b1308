"""The memory-lean large-grid fit configuration (BASELINE config 4 at the
reference's res-8 = 257^3 design limit, ``VolumeConverter.cpp:43-47``):
bf16 march corner table + deferred-wavefront fit forward with per-chunk
remat.  CI exercises one step at res 7 = 129^3 (the smallest grid where
the corner table is NOT VMEM-fused, so the split-phase fetch and the
in-jit differentiable bf16 repack both run); scripts/fit_257.py runs the
full 257^3 convergence loop on the chip and records FIT_257.json."""

import jax.numpy as jnp
import numpy as np
import optax

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.diff.fit import make_fit_step
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def test_fit_step_129_cubed_bf16():
    vol = VoxelVolume.from_generator(
        S.Sphere(radius=65.0), 7, 100.0,
        material=Material(albedo=(0.8, 0.8, 0.8, 1.0), roughness=0.8))
    n = vol.n_voxels
    assert n == 129
    colors = np.full((1, n, n, n, 3), 0.5, np.float32)
    scene = build_scene(
        [vol], [{"volume": 0}],
        camera={"position": (300.0, 0.0, 0.0),
                "rotation": np.asarray(
                    vq.from_euler_degrees(0.0, 180.0, 0.0))},
        dir_light={"direction": np.asarray(vq.forward_vector(
            vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 6.0},
        env=np.full((6, 4, 4, 3), (0.25, 0.45, 0.85), np.float32),
        voxel_colors=colors, march_dtype=jnp.bfloat16)
    # split-phase (un-fused) table: the memory-lean large-grid layout
    assert scene.volumes.corners.shape[-1] == 8
    assert scene.volumes.corners.dtype == jnp.bfloat16

    cams = [dict(position=(300.0, 0.0, 0.0),
                 rotation=np.asarray(
                     vq.from_euler_degrees(0.0, 180.0, 0.0)),
                 fov=60.0)]
    w, h = 48, 36
    targets = jnp.full((1, w * h, 3), 0.3, jnp.float32)
    params = {"sdf": scene.volumes.sdf,
              "voxel_colors": scene.voxel_colors}
    opt = optax.adam(3e-1)
    step = make_fit_step(scene, cams, w, h, RenderMode(), opt,
                         chunk_size=512)
    params2, _, loss = step(params, opt.init(params), targets)
    assert np.isfinite(float(loss))
    moved = float(jnp.max(jnp.abs(params2["sdf"] - scene.volumes.sdf)))
    cmoved = float(jnp.max(jnp.abs(params2["voxel_colors"]
                                   - scene.voxel_colors)))
    assert moved > 0.0 and cmoved > 0.0
