"""Ray/tile data parallelism + gradient DP over the device mesh.

The TPU analogue of the reference's ``DispatchRays(W,H,1)`` thread grid
(``VR/Renderer/DX/Private/DXRenderer.cpp:852-866``): pixels are a flat ray
batch sharded over every mesh axis via ``shard_map``; the scene pytree is
replicated (the <=20-volume scene is small next to the ray state).  The
data-parallel fit step psum's gradients across the mesh — numerically equal
to the single-device gradient because the loss is a lane-wise sum.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from vrt.march import isosurface as _iso
from vrt.render.camera import camera_rays
from vrt.render.gpuscene import GPUScene, RenderMode
from vrt.render.renderer import tonemap, trace_radiance


def _ray_spec(mesh):
    """Shard the leading (ray) axis over every mesh axis."""
    return P(tuple(mesh.axis_names))


def _pad_rays(total: int, n_shards: int, *arrays):
    """Pad the leading axis to a multiple of n_shards.  Padded origins are
    zeros, padded directions ones (any valid ray — results are dropped),
    other arrays zeros.  Returns (padded..., pad)."""
    pad = (-total) % n_shards
    if pad == 0:
        return (*arrays, 0)
    out = []
    for i, a in enumerate(arrays):
        fill = jnp.ones if i == 1 else jnp.zeros
        out.append(jnp.concatenate(
            [a, fill((pad,) + a.shape[1:], a.dtype)]))
    return (*out, pad)


def _interleave_perm(padded: int, n_shards: int):
    """Strided ray->shard assignment: lane i goes to shard i % S, so every
    shard samples the whole image instead of a contiguous raster block.
    Blocked assignment concentrates sky rays on some shards and surface
    rays on others (measured max/mean march-step imbalance 1.96 at S=8,
    DPSCALING.json); round-robin flattens it to ~1.  Returns (perm,
    inv_perm) — both transpose permutations."""
    perm = jnp.arange(padded).reshape(-1, n_shards).T.reshape(-1)
    inv = jnp.arange(padded).reshape(n_shards, -1).T.reshape(-1)
    return perm, inv


def render_image_sharded(scene: GPUScene, width: int, height: int,
                         mode: RenderMode, mesh,
                         interleave: bool = True) -> jax.Array:
    """``render_image`` with rays sharded over the mesh.  [H,W,4] f32,
    bit-matching the single-device render (each lane's march is
    shard-local; only the ray batch is partitioned — round-robin over
    shards by default, see ``_interleave_perm``)."""
    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       width, height)
    total = width * height
    n_shards = math.prod(mesh.devices.shape)
    o, d, _pad = _pad_rays(total, n_shards, o, d)
    if interleave:
        perm, inv = _interleave_perm(o.shape[0], n_shards)
        o, d = o[perm], d[perm]
    spec = _ray_spec(mesh)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), spec, spec),
             out_specs=spec)
    def run(scene, o, d):
        return tonemap(trace_radiance(scene, o, d, 0, mode))

    rgb = jax.jit(run)(scene, o, d)
    if interleave:
        rgb = rgb[inv]
    img = rgb[:total].reshape(height, width, 3)
    return jnp.concatenate(
        [img, jnp.ones((height, width, 1), jnp.float32)], axis=-1)


def make_loss_and_grad_dp(mode: RenderMode, mesh, reduce: str = "sum",
                          interleave: bool = True):
    """Data-parallel pixel loss + gradient.

    Returns ``loss_and_grad(params, scene, o, d, targets) -> (loss, grads)``
    where rays/targets are sharded over the mesh (round-robin by default —
    see ``_interleave_perm``; the loss is permutation-invariant so no
    inverse is needed), ``params`` / ``scene`` are replicated, and both
    outputs are psum'd across every axis — equal to the single-device
    ``jax.value_and_grad`` of the same summed loss.
    """
    from vrt.diff.fit import graft_params, rebuild_accel

    spec = _ray_spec(mesh)
    axes = tuple(mesh.axis_names)
    n_shards = math.prod(mesh.devices.shape)
    scale = 1.0 if reduce == "sum" else None  # mean divides by live elements

    def loss_and_grad(params, scene, o, d, targets):
        total = o.shape[0]
        w = jnp.ones(total, jnp.float32)
        o, d, targets, w, _pad = _pad_rays(total, n_shards, o, d, targets, w)
        if interleave:
            perm, _ = _interleave_perm(o.shape[0], n_shards)
            o, d, targets, w = o[perm], d[perm], targets[perm], w[perm]
        denom = (1.0 if scale == 1.0
                 else float(total) * targets.shape[-1])

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P(), spec, spec, spec, spec),
                 out_specs=(P(), P()))
        def run(params, scene, o, d, targets, w):
            def global_loss(p):
                s = rebuild_accel(graft_params(scene, p))
                rgb = trace_radiance(s, o, d, 0, mode)
                err = (tonemap(rgb) - targets) ** 2
                # psum INSIDE the differentiated function: the loss becomes
                # the global (axis-invariant) scalar, and its gradient wrt
                # the replicated params is the all-reduced gradient — adding
                # another psum outside grad would double-count (shard_map AD
                # already transposes the replicated-param broadcast into a
                # psum of the per-shard cotangents).
                return jax.lax.psum(jnp.sum(err * w[:, None]) / denom, axes)

            # the segment-sum gather transpose (iso.take_rows) is a
            # custom_vjp opaque to shard_map's replication inference;
            # trace this body with the plain gather instead (spec-driven
            # scatter transpose + boundary psum, grads verified equal to
            # single-device in tests/test_dist.py)
            with _iso.plain_gather_transpose():
                return jax.value_and_grad(global_loss)(params)

        return run(params, scene, o, d, targets, w)

    return loss_and_grad


def make_fit_step_dp(mode: RenderMode, mesh, optimizer):
    """Data-parallel fit step factory (BASELINE config 4/5 training path).

    step(params, opt_state, scene, o, d, targets) -> (params, opt_state,
    loss).  Gradients are psum'd across the mesh before the (replicated)
    optimizer update — the all-reduce is issued inside the same jitted
    program as the backward pass, so XLA overlaps it with remaining
    backward work.
    """
    loss_and_grad = make_loss_and_grad_dp(mode, mesh, reduce="mean")

    @jax.jit
    def step(params, opt_state, scene, o, d, targets):
        loss, grads = loss_and_grad(params, scene, o, d, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
