"""vrt — a TPU-native differentiable volumetric raytracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Elyptos/VolumetricRaytracer renderer (C++/DX12/DXR), re-designed TPU-first:

- voxel SDF grids as dense device arrays (no bit-packed 3D textures),
- the collapsed-octree empty-space-skip re-expressed as a vectorized
  per-cell skip-level field (no pointer chasing),
- the per-pixel DXR raygen/intersection/closesthit pipeline re-expressed as
  batched, masked `lax.while_loop` marches + fused shading under `jit`,
- differentiable end-to-end (pixel -> SDF values, materials, lights, camera)
  via implicit-function-theorem gradients at the isosurface root,
- multi-chip via `jax.sharding.Mesh` + `shard_map` (rays sharded, volume
  replicated or brick-sharded with halo exchange).

Layering (mirrors the reference's module map, see SURVEY.md section 1):

- ``vrt.core``    : math types, quaternions, grid laws, serialization, config
- ``vrt.volume``  : voxel SDF grid data model, analytic SDF bake, accel fields
- ``vrt.march``   : DDA + trilinear-cubic isosurface root finding (the core)
- ``vrt.shade``   : Cook-Torrance shading, lights, textures, env cubemaps
- ``vrt.render``  : camera, full render pipeline, the 8 render modes
- ``vrt.scene``   : host-side scene graph (objects, camera, lights)
- ``vrt.diff``    : differentiable fitting (losses, optimizers)
- ``vrt.dist``    : device meshes, ray/volume sharding, collectives
- ``vrt.io``      : .vox scene archives, glTF voxelizer, images
- ``vrt.engine``  : engine loop / tick manager equivalent
- ``vrt.apps``    : CLI entry points (render, voxelize, fit, bench)
"""

__version__ = "0.1.0"

from vrt.core.grid import GridLaw  # noqa: F401
from vrt.volume.volume import VoxelVolume  # noqa: F401
