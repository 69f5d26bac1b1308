"""Distribution layer: device meshes, ray/tile data parallelism, and
slab-sharded (model-parallel) volumes with halo exchange.

The reference is single-GPU/single-process (SURVEY.md §2.11) — this layer
has no reference counterpart.  It is the TPU-native analogue of the roles
the hardware played there:

- ``vrt.dist.mesh``     : ``jax.sharding.Mesh`` construction + multi-host
  ``jax.distributed`` init (the "communication backend" — XLA collectives
  over ICI/DCN, no custom transport).
- ``vrt.dist.sharding`` : rays/tiles sharded over the mesh via ``shard_map``
  (the TPU analogue of ``DispatchRays``' GPU-wide thread grid,
  ``VR/Renderer/DX/Private/DXRenderer.cpp:852-866``) and gradient
  data-parallelism (psum'd grads).
- ``vrt.dist.brick``    : voxel volumes slab-sharded over the 'model' axis
  with 2-voxel halos (cell-corner + normal stencils), ``ppermute`` halo
  refresh, and an all-reduce closest-hit combine.
- ``vrt.dist.slab_render``: the PRODUCTION pipeline over slab-sharded
  volumes — ``SlabTracer`` plugs the model-parallel march into the
  renderer's tracer seam (primary + shadow + bounce rays all sharded),
  plus model-parallel SDF fitting through the full Cook-Torrance shade;
  the ownership-masked psum that combines per-slab results *is* (by
  transposition) the overlapped cross-slab gradient all-reduce.
"""
