"""The full render pipeline — raygen, scene traversal, shading, tonemap.

TPU re-design of the DXR dispatch (``VDXRenderer::DoRendering`` +
``SH/Raytracing*.hlsl``):

- the TLAS over per-instance AABBs becomes a ``lax.scan`` over the (<= 20)
  instances: rays are transformed into each instance's object space, marched
  (``vrt.march``) and the closest accepted hit wins — exactly DXR's
  closest-hit resolution for this scene scale,
- the recursive ``TraceRay`` tree (radiance -> shadow/reflection, recursion
  cap 3, ``SH/RaytracingHlsl.h:32``) is unrolled statically: depth-0/1/2
  radiance traces with masked reflection lanes,
- shading reproduces ``VRClosestHit`` (``SH/Raytracing.hlsl:41-145``) with
  its variants (_NoTex: constant material + geometric normal; _Unlit:
  albedo only), the miss env lookup, and raygen's Reinhard + gamma tonemap.

Known deliberate deviation: the reference indexes the spot-light *color* with
the point-light loop variable (``g_spotLightsCB[pi]``,
``SH/Raytracing.hlsl:127``) — an out-of-scope-variable bug we do not
reproduce; we use the spot light's own color.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vrt.core import quat as vq
from vrt.march import isosurface as iso
from vrt.march.march import march_volume
from vrt.march.resolve import resolve_hits
from vrt.march.types import MarchHit
from vrt.render.gpuscene import (GPUScene, RenderMode, MAX_POINT_LIGHTS,
                                 MAX_SPOT_LIGHTS)
from vrt.shade import brdf as _brdf
from vrt.shade import lights as _lights
from vrt.shade import texture as _tex

MAX_RAY_RECURSION_DEPTH = 3  # SH/RaytracingHlsl.h:32
RADIANCE_TMAX = 10000.0      # SH/Include/Ray.hlsli:72
DIR_SHADOW_TMAX = 5000.0     # SH/Raytracing.hlsl:59


def _safe_unit(v):
    """Gradient-safe normalize: zero vectors map to zero (not NaN) and the
    backward pass stays finite.  Deviates from HLSL normalize only on
    exactly-zero vectors (where the reference produces NaN pixels that its
    UNORM target would blacken anyway)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.where(n2 > 0, n2, 1.0))
    return jnp.where(n2 > 0, v / n, 0.0)


def _safe_div(num, den):
    ok = den != 0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def _world_to_object(pos, rot, scale, o_w, d_w):
    """Instance transform is rotation*scale*translation in row-vector
    convention (``RDXLevelObject.cpp:44-50``): world = diag(s)*R(v) + p.
    Rays transform with the inverse; t values are preserved."""
    qi = vq.conjugate(rot)
    o = vq.rotate(qi, (o_w - pos) / scale)
    d = vq.rotate(qi, d_w / scale)
    return o, d


def _object_normal_to_world(rot, scale, n_obj):
    """Normals transform through ObjectToWorld with w=0: diag(s)*R(n),
    *not* renormalized (``SH/Raytracing.hlsl:73-75``)."""
    return vq.rotate(rot, n_obj) * scale


def march_scene(scene: GPUScene, o_w, d_w, t_max, interp: bool,
                debug_overlay: bool = False, lane_marcher=None):
    """Closest hit across all active instances — the TLAS equivalent.

    DXR-style sequential candidate traversal: per ray, candidate instances
    are ordered by AABB entry t (the order the hardware TLAS would surface
    them) and marched one static pass at a time over lanes = R.  Pass j's
    t_max is clamped to the best hit so far, so a later candidate is only
    marched where it could still win (closest-hit ordering: once
    ``t_enter > best_t`` the slab test retires the lane instantly, and a
    pass whose chunk has no live lanes exits its while_loop immediately).
    Versus fusing all (ray, instance) pairs into I*R lanes, this keeps the
    per-step gather traffic at R lanes — instances rarely overlap on
    screen, so fused lanes are mostly dead weight — and gives each
    candidate its own 255-step cap exactly like the reference's
    per-invocation intersection-shader budget (``SH/Raytracing.hlsl:229``).

    Ties between instances at identical hit t resolve to the candidate
    entered first (the reference's sequential TLAS scan keeps the lower
    *index* on exact ties — a measure-zero deviation).

    Returns (hit: MarchHit (object-space brackets of the winning instance),
    inst: i32 [R] winning instance id, -1 when none).

    ``lane_marcher`` overrides the per-candidate lane march (signature of
    ``march_lanes``) — the compacted frame-wide march passes
    ``march_lanes_compact`` here.
    """
    from vrt.march.march import march_lanes, ray_aabb

    lane_marcher = lane_marcher or march_lanes

    n_inst = scene.num_instances
    if n_inst == 0:
        # Empty scene (e.g. an Engine frame before any object is added):
        # all-miss, zero accounted steps — the vectorized path below would
        # stack an empty candidate list.
        hit = dataclasses.replace(MarchHit.none_like(o_w),
                                  steps=jnp.zeros(o_w.shape[0], jnp.int32))
        return hit, jnp.full(o_w.shape[0], -1, jnp.int32)

    # Per-instance object-space rays + slab tests, all ELEMENTWISE (a
    # static unroll over <= 20 instances).  The per-pass candidate pick
    # below is a where-chain over these — measured ~400 ms/frame cheaper
    # at 2M lanes than materializing [I,R,3] arrays and gathering rows
    # along axis 0 (axis-0 take_along_axis compiles to a per-element
    # gather on TPU).
    o_objs, d_objs, oks, keys = [], [], [], []
    ext_i = scene.volumes.extends[scene.inst_volume]         # [I]
    for i in range(n_inst):
        o_i, d_i = _world_to_object(scene.inst_pos[i], scene.inst_rot[i],
                                    scene.inst_scale[i], o_w, d_w)
        ok_i, te_i, _ = ray_aabb(o_i, d_i, -ext_i[i], ext_i[i], t_max)
        ok_i = ok_i & scene.inst_active[i]
        o_objs.append(o_i)
        d_objs.append(d_i)
        oks.append(ok_i)
        keys.append(jnp.where(ok_i, te_i, jnp.inf))
    key = jnp.stack(keys)                                    # [I,R]
    order = jnp.argsort(key, axis=0)                         # [I,R]

    best = MarchHit.none_like(o_w)
    best_inst = jnp.full(o_w.shape[0], -1, jnp.int32)
    best_t = jnp.full(o_w.shape[0], jnp.inf)
    total_steps = jnp.zeros(o_w.shape[0], jnp.int32)

    def pick(rows, inst_j):
        out = rows[0]
        for i in range(1, n_inst):
            m = inst_j == i
            m = m.reshape(m.shape + (1,) * (rows[i].ndim - m.ndim))
            out = jnp.where(m, rows[i], out)
        return out

    for j in range(n_inst):
        inst_j = order[j]                                    # [R]
        live = pick(oks, inst_j) & (pick(keys, inst_j) < best_t)
        t_max_j = jnp.where(live, jnp.minimum(t_max, best_t), -jnp.inf)
        o_j = pick(o_objs, inst_j)                           # [R,3]
        d_j = pick(d_objs, inst_j)
        h = lane_marcher(scene.volumes, scene.inst_volume[inst_j], o_j, d_j,
                         t_max_j, interp=interp, debug_overlay=debug_overlay)
        # per-lane work accounting accumulates over ALL candidate passes
        # (roofline instrumentation); the winner-select strips it first.
        total_steps = total_steps + h.steps
        h = dataclasses.replace(h, steps=None)
        closer = h.hit & (h.t < best_t)
        best = h.select(closer, best)
        best_inst = jnp.where(closer, inst_j, best_inst)
        best_t = jnp.where(closer, h.t, best_t)

    # Checkpoint tag: under the fit path's remat
    # (``save_only_these_names("march")``, vrt/diff/fit.py) the march's
    # outputs are SAVED residuals, so the backward pass re-runs only the
    # cheap resolve/shade math — never the traversal while_loops.  Outside
    # a checkpoint context the names are inert.
    from jax.ad_checkpoint import checkpoint_name

    best = dataclasses.replace(best, steps=total_steps)
    best = jax.tree.map(lambda x: checkpoint_name(x, "march"), best)
    best_inst = checkpoint_name(best_inst, "march")
    return best, best_inst


def _per_ray_instance(scene: GPUScene, inst):
    """Gather per-ray instance transform + volume data (inst i32 [R])."""
    if scene.num_instances == 0:
        # no instances to gather from: every lane is a miss (inst == -1)
        # and shading discards these values — identity transform, volume 0
        vol_id = jnp.zeros_like(inst)
        zf3 = jnp.zeros(inst.shape + (3,), jnp.float32)
        return dict(
            vol=vol_id, pos=zf3,
            rot=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                                 inst.shape + (4,)),
            scale=zf3 + 1.0,
            n=scene.volumes.n[vol_id],
            cell_size=scene.volumes.cell_size[vol_id],
            extends=scene.volumes.extends[vol_id])
    ic = jnp.maximum(inst, 0)
    vol_id = scene.inst_volume[ic]
    return dict(
        vol=vol_id,
        pos=scene.inst_pos[ic],
        rot=scene.inst_rot[ic],
        scale=scene.inst_scale[ic],
        n=scene.volumes.n[vol_id],
        cell_size=scene.volumes.cell_size[vol_id],
        extends=scene.volumes.extends[vol_id],
    )


def resolve_scene(scene: GPUScene, o_w, d_w, hit: MarchHit, inst):
    """Differentiable (t, object-space normal, unlit) for scene hits.

    Resolve reads the packed corner table when present — including a
    reduced-precision (bf16 fast-march) one: falling back to 8 scattered
    f32 voxel gathers per trilinear sample costs more than the fast mode
    saves, and the bf16 rounding is comparable to the reference's 15-bit
    fixed-point volume encoding anyway."""
    pr = _per_ray_instance(scene, inst)
    o, d = _world_to_object(pr["pos"], pr["rot"], pr["scale"], o_w, d_w)
    fetch = iso.make_stacked_fetch(scene.volumes.sdf, pr["n"], pr["vol"])
    cfetch = None
    if scene.volumes.corners is not None:
        cfetch = iso.make_stacked_corner_fetch(scene.volumes.corners,
                                               pr["n"], pr["vol"])
    return resolve_hits(fetch, pr["cell_size"], pr["extends"], o, d, hit,
                        cfetch=cfetch)


def _voxel_color_sample(scene: GPUScene, pr, hit: MarchHit, o_w, d_w, t):
    """Trilinear sample of the per-voxel color field at the hit point
    (differentiable-fit extension; replaces tint*texture as albedo)."""
    o, d = _world_to_object(pr["pos"], pr["rot"], pr["scale"], o_w, d_w)
    h = pr["cell_size"]
    cell = hit.cell
    cell_base = cell.astype(jnp.float32) * h[..., None] - pr["extends"][..., None]
    p = (o + d * t[..., None] - cell_base) / h[..., None]
    idx = cell[:, None, :] + iso.CORNERS[None, :, :]           # [R,8,3]
    valid = jnp.all((idx >= 0) & (idx < pr["n"][:, None, None]), axis=-1)
    pcc = scene.voxel_color_corners
    if pcc is not None:
        # corner-packed colors: ONE 24-float row gather per hit cell (and
        # one row scatter in the backward) instead of 8 voxel gathers
        cn = pcc.shape[1]
        ic = jnp.clip(cell, 0, cn - 1)
        lin = (pr["vol"] * (cn * cn * cn)
               + (ic[..., 0] * cn + ic[..., 1]) * cn + ic[..., 2])
        rows = pcc.reshape(-1, 24)[lin].reshape(-1, 8, 3)
        cvals = jnp.where(valid[..., None], rows.astype(jnp.float32), 0.0)
    else:
        colors = scene.voxel_colors
        nn = colors.shape[1]
        flat = colors.reshape(-1, 3)
        ic = jnp.clip(idx, 0, nn - 1)
        lin = (pr["vol"][:, None] * (nn * nn * nn) + ic[..., 0] * (nn * nn)
               + ic[..., 1] * nn + ic[..., 2])
        cvals = jnp.where(valid[..., None], flat[lin], 0.0)
    w = jnp.abs((1.0 - iso.CORNERS)[None, :, :] - p[:, None, :])
    w = jnp.prod(w, axis=-1)                                   # [R,8]
    return jnp.sum(w[..., None] * cvals, axis=1)


class SceneTracer:
    """The march/resolve seam of the render pipeline.

    The default tracer is the replicated TLAS-equivalent
    (``march_scene``/``resolve_scene``); the slab-sharded pipeline
    substitutes a tracer that marches one slab-sharded volume and
    all-reduces hits across the model axis (``vrt.dist.slab_render``) —
    everything above this seam (shading, lights, bounce, tonemap) is the
    SAME production code in both.
    """

    def march(self, scene: GPUScene, o_w, d_w, t_max, interp: bool,
              debug_overlay: bool = False):
        return march_scene(scene, o_w, d_w, t_max, interp,
                           debug_overlay=debug_overlay)

    def resolve(self, scene: GPUScene, o_w, d_w, hit: MarchHit, inst):
        return resolve_scene(scene, o_w, d_w, hit, inst)


_DEFAULT_TRACER = SceneTracer()


def trace_shadow(scene: GPUScene, o_w, d_w, max_dist, depth: int,
                 interp: bool, relevant=None, tracer: SceneTracer = None):
    """Boolean occlusion trace (``TraceShadowRay``, ``Ray.hlsli:81-109``):
    any accepted hit within [0, max_dist] blocks; recursion-capped rays
    return un-blocked.

    ``relevant`` masks lanes whose result the caller discards (miss pixels,
    below-threshold lights): their t_max is forced to -inf so the slab test
    deactivates them instantly and the batched while_loop runs only as long
    as the *relevant* lanes need.  Pure optimization — irrelevant lanes'
    returned values are unspecified.
    """
    if depth >= MAX_RAY_RECURSION_DEPTH:
        return jnp.zeros(o_w.shape[0], bool)
    if relevant is not None:
        max_dist = jnp.where(relevant, max_dist, -jnp.inf)
    hit, _ = (tracer or _DEFAULT_TRACER).march(scene, o_w, d_w, max_dist,
                                               interp)
    return hit.hit


def _shade_lit(scene: GPUScene, o_w, d_w, t, n_obj, inst, hit: MarchHit,
               depth: int, mode: RenderMode, defer_reflection: bool = False,
               defer_dir_shadow: bool = False,
               tracer: SceneTracer = None):
    """``VRClosestHit`` lit path (``SH/Raytracing.hlsl:49-144``).

    With ``defer_reflection`` the mirror-bounce ray is NOT traced inline;
    instead its origin/direction and the exact linear composition weights
    are returned so the caller can batch all bounce rays of a frame into
    their own sorted pass (``radiance`` is elementwise in ``li``, so
    ``brdf*li*(n.wi)`` factors into W applied after the bounce trace —
    bit-exact deferral).  ``defer_dir_shadow`` likewise defers the
    directional-light shadow trace: the untraced dir-light contribution and
    the shadow-ray origins are returned so the caller can batch all shadow
    rays of the frame into their own sorted pass (the term is
    ``where(blocked, 0, dir_add)`` — exact post-composition).
    Returns (diffuse, refl_aux | None, shadow_aux | None).
    """
    pr = _per_ray_instance(scene, inst)
    vol_id = pr["vol"]

    hit_pos = o_w + t[..., None] * d_w
    shadow_origin = hit_pos - d_w * 0.1

    if not defer_dir_shadow:
        shadow_dir_hit = trace_shadow(scene, shadow_origin,
                                      jnp.broadcast_to(scene.dir_light_dir,
                                                       d_w.shape),
                                      jnp.full(t.shape, DIR_SHADOW_TMAX),
                                      depth + 1, mode.interp,
                                      relevant=hit.hit, tracer=tracer)

    diffuse = jnp.full(d_w.shape, _brdf.SHADOW_BRIGHTNESS)

    tint = scene.tint[vol_id][..., :3]
    k = scene.k[vol_id]

    if mode.textured:
        obj_pos = vq.rotate(vq.conjugate(pr["rot"]),
                            (hit_pos - pr["pos"]) / pr["scale"])
        tscale = scene.tex_scale[vol_id]
        albedo = tint * _tex.tri_sample(scene.textures, scene.tex_sizes,
                                        scene.albedo_tex[vol_id], tscale,
                                        obj_pos, n_obj)
        rm = _tex.tri_sample(scene.textures, scene.tex_sizes,
                             scene.rm_tex[vol_id], tscale, obj_pos, n_obj)
        roughness = jnp.clip(scene.roughness[vol_id] * rm[..., 0], 0.0, 1.0)
        metallic = jnp.clip(scene.metallic[vol_id] * rm[..., 1], 0.0, 1.0)
        n_shade = _tex.tri_sample_normal(scene.textures, scene.tex_sizes,
                                         scene.normal_tex[vol_id], tscale,
                                         obj_pos, n_obj)
    else:
        albedo = tint
        roughness = jnp.clip(scene.roughness[vol_id], 0.0, 1.0)
        metallic = jnp.clip(scene.metallic[vol_id], 0.0, 1.0)
        n_shade = n_obj

    if scene.use_voxel_colors:
        albedo = _voxel_color_sample(scene, pr, hit, o_w, d_w, t)

    n_w = _object_normal_to_world(pr["rot"], pr["scale"], n_shade)
    wo = -d_w

    # mirror reflection for roughness < 0.3 (SH/Raytracing.hlsl:79-91).
    # Statically skipped when no scene material can reflect — the traced
    # contribution would be identically zero (Radiance with Li = 0).
    refl_aux = None
    if scene.any_reflective and depth + 1 < MAX_RAY_RECURSION_DEPTH:
        refl_dir = d_w - 2.0 * jnp.sum(d_w * n_w, -1, keepdims=True) * n_w
        refl_dir = _safe_unit(refl_dir)
        gate = hit.hit & (roughness < 0.3)
        if defer_reflection:
            w_lin = (_brdf.brdf(refl_dir, wo, n_w, albedo, roughness,
                                metallic, k)
                     * jnp.sum(n_w * refl_dir, -1, keepdims=True))
            refl_aux = dict(origin=shadow_origin, dir=refl_dir, gate=gate,
                            weight=w_lin,
                            scale=1.0 - roughness * 2.2)
        else:
            refl_rgb = trace_radiance(scene, shadow_origin, refl_dir,
                                      depth + 1, mode, active=gate,
                                      tracer=tracer)
            refl_rgb = jnp.maximum(
                0.0, refl_rgb * (1.0 - (roughness * 2.2)[..., None]))
            add = _brdf.radiance(refl_rgb, refl_dir, wo, n_w, albedo,
                                 roughness, metallic, k)
            diffuse = diffuse + jnp.where((roughness < 0.3)[..., None],
                                          add, 0.0)

    # directional light (SH/Raytracing.hlsl:93-98)
    li = scene.dir_light_strength
    dir_add = _brdf.radiance(jnp.broadcast_to(li, d_w.shape),
                             jnp.broadcast_to(scene.dir_light_dir, d_w.shape),
                             wo, n_w, albedo, roughness, metallic, k)
    shadow_aux = None
    if defer_dir_shadow:
        shadow_aux = dict(origin=shadow_origin, add=dir_add, gate=hit.hit)
    else:
        diffuse = diffuse + jnp.where(shadow_dir_hit[..., None], 0.0,
                                      dir_add)

    # point lights (SH/Raytracing.hlsl:100-120); the count is static
    for pi in range(scene.num_point):
        delta = scene.point_pos[pi] - shadow_origin
        dist = jnp.linalg.norm(delta, axis=-1)
        inten = _lights.point_light_intensity(
            scene.point_intensity[pi], dist,
            scene.point_att_l[pi], scene.point_att_e[pi])
        li = scene.point_color[pi][:3] * inten[..., None]
        sdir = _safe_div(delta, dist[..., None])
        sh = trace_shadow(scene, shadow_origin, sdir, dist,
                          depth + 1, mode.interp,
                          relevant=hit.hit & (inten > 0.005), tracer=tracer)
        add = _brdf.radiance(li, sdir, wo, n_w, albedo, roughness,
                             metallic, k)
        lit = (inten > 0.005) & ~sh
        diffuse = diffuse + jnp.where(lit[..., None], add, 0.0)

    # spot lights (SH/Raytracing.hlsl:122-139) — color indexed correctly
    # (the reference's [pi] indexing bug is intentionally not reproduced)
    for si in range(scene.num_spot):
        delta = scene.spot_pos[si] - shadow_origin
        dist = jnp.linalg.norm(delta, axis=-1)
        inten = _lights.spot_light_intensity(
            shadow_origin, dist, scene.spot_pos[si], scene.spot_fwd[si],
            scene.spot_intensity[si], scene.spot_att_l[si],
            scene.spot_att_e[si], scene.spot_cos_angle[si],
            scene.spot_cos_falloff[si])
        li = scene.spot_color[si][:3] * inten[..., None]
        sdir = _safe_div(delta, dist[..., None])
        sh = trace_shadow(scene, shadow_origin, sdir, dist,
                          depth + 1, mode.interp,
                          relevant=hit.hit & (inten > 0.01), tracer=tracer)
        add = _brdf.radiance(li, sdir, wo, n_w, albedo, roughness,
                             metallic, k)
        lit = (inten > 0.01) & ~sh
        diffuse = diffuse + jnp.where(lit[..., None], add, 0.0)

    return diffuse, refl_aux, shadow_aux


def _shade_unlit_mode(scene: GPUScene, o_w, d_w, t, n_obj, inst,
                      hit: MarchHit, mode: RenderMode):
    """``Raytracing_Unlit.hlsl`` closest hit: tinted albedo only."""
    pr = _per_ray_instance(scene, inst)
    vol_id = pr["vol"]
    tint = scene.tint[vol_id][..., :3]
    if scene.use_voxel_colors:
        return _voxel_color_sample(scene, pr, hit, o_w, d_w, t)
    if mode.textured:
        hit_pos = o_w + t[..., None] * d_w
        obj_pos = vq.rotate(vq.conjugate(pr["rot"]),
                            (hit_pos - pr["pos"]) / pr["scale"])
        return tint * _tex.tri_sample(scene.textures, scene.tex_sizes,
                                      scene.albedo_tex[vol_id],
                                      scene.tex_scale[vol_id], obj_pos, n_obj)
    return jnp.broadcast_to(tint, d_w.shape)


def _dead_refl_aux(o_w):
    """Bounce-batch aux with no live lanes (pytree-matches the live one)."""
    zf3 = o_w * 0.0
    return dict(origin=zf3, dir=zf3 + 1.0, gate=jnp.zeros(o_w.shape[0], bool),
                weight=zf3, scale=zf3[:, 0])


def _dead_shadow_aux(o_w):
    """Shadow-batch aux with no live lanes."""
    zf3 = o_w * 0.0
    return dict(origin=zf3, add=zf3, gate=jnp.zeros(o_w.shape[0], bool))


def trace_radiance(scene: GPUScene, o_w, d_w, depth: int, mode: RenderMode,
                   active=None, defer_reflection: bool = False,
                   defer_dir_shadow: bool = False,
                   tracer: SceneTracer = None, premarched=None):
    """One radiance dispatch level; returns linear rgb [R,3].

    Mirrors ``TraceRadianceRay`` + closest-hit/miss resolution; recursion is
    a static Python unroll over depth (cap 3).  ``active`` masks lanes whose
    result the caller discards (e.g. non-reflective pixels spawning bounce
    rays): they are deactivated before the march so the shared while_loop
    runs only for live lanes.

    ``defer_reflection`` returns the bounce rays and their exact linear
    composition weights instead of tracing the depth+1 mirror ray inline;
    ``defer_dir_shadow`` likewise returns the directional-light shadow rays
    and the untraced light contribution.  With either flag the return is a
    tuple ``(rgb, [refl_aux], [shadow_aux])`` for a batched second pass
    (see ``render_image``); compose with ``compose_deferred_reflection`` /
    ``compose_deferred_shadow``.
    """
    r = o_w.shape[0]
    if depth >= MAX_RAY_RECURSION_DEPTH:
        rgb0 = jnp.zeros((r, 3), jnp.float32)
        out = (rgb0,)
        if defer_reflection:
            out += (_dead_refl_aux(o_w),)
        if defer_dir_shadow:
            out += (_dead_shadow_aux(o_w),)
        return out if len(out) > 1 else rgb0

    tracer = tracer or _DEFAULT_TRACER
    if premarched is not None:
        # The root march already ran frame-wide (the compacted wavefront
        # march); this level only resolves and shades its slice of hits.
        hit, inst = premarched
    else:
        t_max = jnp.full(r, RADIANCE_TMAX)
        if active is not None:
            t_max = jnp.where(active, t_max, -jnp.inf)
        hit, inst = tracer.march(scene, o_w, d_w, t_max, mode.interp,
                                 debug_overlay=mode.debug_overlay)
    t, n_obj, unlit_attr = tracer.resolve(scene, o_w, d_w, hit, inst)

    # Sanitize miss lanes before shading: their values are discarded by the
    # final select, but infinities reaching the shading math would poison
    # the backward pass (0-cotangent * inf = NaN).
    t = jnp.where(hit.hit, t, 0.0)
    n_obj = jnp.where(hit.hit[..., None], n_obj,
                      jnp.asarray([0.0, 0.0, 1.0]))

    miss_rgb = _tex.sample_env(scene.env, d_w)

    refl_aux = shadow_aux = None
    if mode.lit:
        shaded, refl_aux, shadow_aux = _shade_lit(
            scene, o_w, d_w, t, n_obj, inst, hit, depth, mode,
            defer_reflection=defer_reflection,
            defer_dir_shadow=defer_dir_shadow, tracer=tracer)
    else:
        shaded = _shade_unlit_mode(scene, o_w, d_w, t, n_obj, inst, hit, mode)

    # attr.unlit lanes show the raw (object-space) attribute normal
    shaded = jnp.where(unlit_attr[..., None], n_obj, shaded)
    rgb = jnp.where(hit.hit[..., None], shaded, miss_rgb)
    if not (defer_reflection or defer_dir_shadow):
        return rgb
    out = (rgb,)
    if defer_reflection:
        if refl_aux is None:  # unlit mode / nothing reflective: dead batch
            refl_aux = _dead_refl_aux(o_w)
        else:
            # unlit-attribute lanes replace the shade entirely — no add
            refl_aux = dict(refl_aux, gate=refl_aux["gate"] & ~unlit_attr)
        out += (refl_aux,)
    if defer_dir_shadow:
        if shadow_aux is None:
            shadow_aux = _dead_shadow_aux(o_w)
        else:
            shadow_aux = dict(shadow_aux,
                              gate=shadow_aux["gate"] & ~unlit_attr)
        out += (shadow_aux,)
    return out


def compose_deferred_reflection(rgb, aux, refl_rgb):
    """Exact composition of a deferred bounce pass: the attenuation clamp
    and the linear BRDF weight from ``_shade_lit``
    (``SH/Raytracing.hlsl:79-91``), applied post-trace."""
    refl = jnp.maximum(0.0, refl_rgb * aux["scale"][..., None])
    return rgb + jnp.where(aux["gate"][..., None], aux["weight"] * refl, 0.0)


def compose_deferred_shadow(rgb, aux, blocked):
    """Exact composition of a deferred dir-light shadow pass: add the
    untraced directional contribution on unblocked gated lanes
    (``diffuse += where(shadow_hit, 0, dir_add)``, ``Raytracing.hlsl:98``)."""
    return rgb + jnp.where((aux["gate"] & ~blocked)[..., None],
                           aux["add"], 0.0)


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """``x[perm]`` whose TRANSPOSE is the inverse-permutation gather.

    XLA transposes a gather into a scatter-add (measured 188 ms vs 26 ms
    for the equivalent gather at 2M rows, scripts/profile_frame.py); for
    a permutation the cotangent is exactly ``g[inv_perm]``, so the
    custom VJP keeps the backward on the fast path too."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return g[inv_perm], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def permute_rows(x, perm, inv_perm=None):
    """Differentiable row permutation (see ``_permute_rows``)."""
    if inv_perm is None:
        inv_perm = jnp.argsort(perm)
    return _permute_rows(x, perm, inv_perm)


def tonemap(rgb):
    """Raygen post-process: Reinhard c/(c+1) then gamma 1/2.2
    (``SH/Raytracing.hlsl:34-38``), followed by the R8G8B8A8_UNORM
    render-target conversion (NaN -> 0, clamp to [0,1]) the reference's
    swapchain applies.  Negative radiance (the BRDF's unclamped n.wi) feeds
    pow with a negative base exactly as in HLSL; the UNORM conversion is
    what makes those pixels black on screen."""
    c = rgb / (rgb + 1.0)
    # gradient-safe power: pow'(0) is +inf and 0-cotangent * inf = NaN, so
    # both where-branches must be finite-differentiable.  Values unchanged:
    # c > 0 -> c^(1/2.2); c == 0 -> 0; c < 0 -> NaN (flushed by the UNORM
    # conversion below, as the reference's render target does).
    pos = c > 0
    out = jnp.where(pos, jnp.power(jnp.where(pos, c, 1.0), 1.0 / 2.2),
                    jnp.where(c < 0, jnp.nan, 0.0))
    return jnp.clip(jnp.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0),
                    0.0, 1.0)


def _scene_hit_key(scene: GPUScene, o_w, d_w):
    """Cheap per-ray sort key predicting march length (pure slab tests, no
    marching): the longest in-volume chord across candidate instances,
    quantized to cells, negated so long-march rays sort first; rays that
    can hit nothing get the largest key.  Chunking sorted rays makes each
    chunk's while_loop trip count homogeneous — a chunk only runs as long
    as its slowest lane, so mixing a silhouette-grazing ray into a chunk
    of sky rays used to cost the whole chunk the grazer's trip."""
    from vrt.march.march import ray_aabb

    chord = jnp.zeros(o_w.shape[0], jnp.float32)
    for i in range(scene.num_instances):
        o, d = _world_to_object(scene.inst_pos[i], scene.inst_rot[i],
                                scene.inst_scale[i], o_w, d_w)
        vol = scene.inst_volume[i]
        ext = scene.volumes.extends[vol]
        ok, t_en, t_ex = ray_aabb(o, d, -ext, ext,
                                  jnp.full(o.shape[0], RADIANCE_TMAX))
        ok = ok & scene.inst_active[i]
        c = (t_ex - jnp.maximum(t_en, 0.0)) / scene.volumes.cell_size[vol]
        chord = jnp.maximum(chord, jnp.where(ok, c, 0.0))
    return -jnp.ceil(chord).astype(jnp.int32)


@partial(jax.jit, static_argnames=("width", "height", "mode", "chunk_size",
                                   "sort_rays", "bounce_sort", "remat",
                                   "compact"))
def render_image(scene: GPUScene, width: int, height: int,
                 mode: RenderMode = RenderMode(),
                 chunk_size: int | None = None,
                 sort_rays: bool = False,
                 bounce_sort: bool = False,
                 remat: bool = False,
                 compact: bool = False):
    """Full frame: camera rays -> radiance -> tonemap.  [H,W,4] float32.

    ``chunk_size`` splits the pixel batch into independently-marched chunks
    (``lax.map``): each chunk's masked while_loop runs only as many steps as
    *its* slowest ray, so sky-dominated regions finish early instead of
    idling behind the frame's worst ray.  ``sort_rays`` additionally groups
    rays by a cheap can-hit-the-scene slab key before chunking, so whole
    miss-chunks retire in one or two iterations.  None processes the frame
    as one batch.

    ``remat`` wraps each chunk body in ``jax.checkpoint`` with the
    ``save_only_these_names("march")`` policy, making the full deferred
    wavefront pipeline differentiable at frame scale: the backward replays
    one chunk's resolve/shade math at a time against the SAVED march hit
    records (the traversal while_loops never re-run), instead of stacking
    every chunk's shading residuals across the whole frame — which blows
    host memory/the TPU compile helper at 1080p.  Forward-only rendering is
    unaffected (checkpoint is the identity without a grad).

    ``compact`` runs the PRIMARY march frame-wide with mid-march live-lane
    compaction over wide chunks (``march_lanes_compact``) instead of
    per-chunk while_loops, then resolves/shades per chunk against the
    precomputed hits.  Hits are equivalent modulo float-ULP (the compacted
    rounds compile separately, so FMA contraction can differ at bracket
    boundaries).  The bounce/shadow passes keep the sorted-chunk path:
    their live fractions are small enough that the existing sort already
    packs them, and compaction's full-width sorts+row-gathers were
    measured to cost more than they save there
    (scripts/probe_steps_hist.py, probe_march_width.py).
    """
    from vrt.render.camera import camera_rays

    o, d = camera_rays(scene.cam_pos, scene.cam_rot, scene.cam_fov,
                       width, height)
    total = width * height
    if chunk_size and total > chunk_size:
        perm = None
        if sort_rays:
            # slab-chord proxy key: long potential marches first, and rays
            # clustered by instance.  A measured-trip-count probe-march key
            # was evaluated through round 3 and always lost (1544 vs
            # 1415 ms at the winning chunk size, scripts/probe_frame_sweep
            # .py) — the ~50 ms probe plus lost instance clustering cost
            # more than the better march homogeneity saved.
            key = _scene_hit_key(scene, o, d)
            perm = jnp.argsort(key, stable=True)
            # one 24 B-row gather instead of two 12 B ones (narrow-row
            # gathers are row-count-bound on v5e; XProf measured the
            # [R,3] permutes at ~33 ms/2M rows each)
            od = jnp.concatenate([o, d], axis=1)[perm]
            o, d = od[:, :3], od[:, 3:]
        pad = (-total) % chunk_size
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        oc = o.reshape(-1, chunk_size, 3)
        dc = d.reshape(-1, chunk_size, 3)
        defer_refl = mode.lit and scene.any_reflective
        defer_sh = mode.lit

        compact_marcher = None
        if compact:
            from vrt.march.march import make_compact_marcher

            compact_marcher = partial(make_compact_marcher, chunk_size)
            p_hit, p_inst = march_scene(
                scene, o, d, jnp.full(o.shape[0], RADIANCE_TMAX),
                mode.interp, debug_overlay=mode.debug_overlay,
                lane_marcher=compact_marcher())
            chunked = lambda x: x.reshape((-1, chunk_size) + x.shape[2:])  # noqa: E731,E501
            p_hit_c = jax.tree.map(
                lambda x: x.reshape((-1, chunk_size) + x.shape[1:]), p_hit)
            p_inst_c = p_inst.reshape(-1, chunk_size)
            del chunked

        def primary_chunk(od):
            if compact:
                oc1, dc1, hc1, ic1 = od
                # the frame-wide march already knows: skip resolve/shade
                # for chunks with no hits at all (pure env misses)
                can_hit = jnp.any(hc1.hit)
            else:
                oc1, dc1 = od
                # Chunks whose rays can hit no instance AABB shade as pure
                # env misses; lax.cond skips the march/resolve/shadow
                # programs at RUNTIME for them (sky is most of a frame, and
                # its fixed full-width entry/resolve gathers dominated dead
                # chunks).
                can_hit = jnp.any(_scene_hit_key(scene, oc1, dc1) < 0)

            def live(_):
                return trace_radiance(
                    scene, oc1, dc1, 0, mode,
                    defer_reflection=defer_refl,
                    defer_dir_shadow=defer_sh,
                    premarched=(hc1, ic1) if compact else None)

            def dead(_):
                rgb = _tex.sample_env(scene.env, dc1)
                out = (rgb,)
                if defer_refl:
                    out += (_dead_refl_aux(oc1),)
                if defer_sh:
                    out += (_dead_shadow_aux(oc1),)
                return out if len(out) > 1 else rgb

            return jax.lax.cond(can_hit, live, dead, None)

        if remat:
            primary_chunk = jax.checkpoint(
                primary_chunk,
                policy=jax.checkpoint_policies.save_only_these_names("march"))
        p_args = (oc, dc, p_hit_c, p_inst_c) if compact else (oc, dc)
        out = jax.lax.map(primary_chunk, p_args)
        if defer_refl or defer_sh:
            parts = list(out)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
            rgb = flat(parts.pop(0))
            refl_aux = (jax.tree.map(flat, parts.pop(0)) if defer_refl
                        else None)
            sh_aux = jax.tree.map(flat, parts.pop(0)) if defer_sh else None
        else:
            rgb = out.reshape(-1, 3)

        b_rgb = b_sh = None
        if defer_refl:
            # Wavefront bounce pass: primary chunks emit reflection rays +
            # exact linear weights; live bounce lanes cluster into a few
            # chunks (they exist only on reflective-hit lanes, which the
            # primary sort already groups) and all-dead chunks are
            # cond-skipped entirely.  The bounce's own directional shadow
            # rays are deferred too, into the combined shadow pass below
            # (exact: the term is linear in the blocked mask).
            # ``bounce_sort`` compacts live bounce lanes by their own
            # march-length key (dead lanes last); measured a LOSS on the
            # flagship frame (1534 vs 1419 ms, scripts/probe_bounce_sort
            # .py — the chord-sorted primary order already clusters live
            # bounce lanes and the 2M-lane sort+permutes cost more than
            # the extra skipped chunks), so it defaults off.
            bperm = None
            if bounce_sort:
                bgate = refl_aux["gate"]
                bkey = _scene_hit_key(scene, refl_aux["origin"],
                                      refl_aux["dir"])
                bkey = jnp.where(bgate, bkey, jnp.iinfo(jnp.int32).max)
                bperm = jnp.argsort(bkey, stable=True)
                refl_sorted = jax.tree.map(lambda x: x[bperm], refl_aux)
            else:
                refl_sorted = refl_aux
            ob = refl_sorted["origin"].reshape(-1, chunk_size, 3)
            db = refl_sorted["dir"].reshape(-1, chunk_size, 3)
            gb = refl_sorted["gate"].reshape(-1, chunk_size)

            # NOTE: a frame-wide compacted bounce march (premarched hits,
            # like the primary) was re-measured after the preamble and
            # subnormal fixes and still LOSES: 1389 vs 1202 ms on the
            # flagship frame — bounce live lanes are already clustered by
            # the primary chord sort and the per-chunk cond skips the
            # rest, so compaction's full-width sorts cannot amortize.
            def bounce_chunk(x):
                oc1, dc1, g1 = x

                def live(_):
                    return trace_radiance(scene, oc1, dc1, 1, mode,
                                          active=g1, defer_dir_shadow=True)

                def dead(_):
                    return (jnp.zeros((oc1.shape[0], 3), jnp.float32),
                            _dead_shadow_aux(oc1))

                return jax.lax.cond(jnp.any(g1), live, dead, None)

            if remat:
                bounce_chunk = jax.checkpoint(
                    bounce_chunk,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "march"))
            b_rgb, b_sh = jax.lax.map(bounce_chunk, (ob, db, gb))
            b_rgb = b_rgb.reshape(-1, 3)
            b_sh = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), b_sh)
            if bperm is not None:
                binv = jnp.argsort(bperm)
                b_rgb = b_rgb[binv]
                b_sh = jax.tree.map(lambda x: x[binv], b_sh)

        if defer_sh:
            # Combined wavefront shadow pass: the primary AND bounce
            # passes' directional shadow rays in one batch, re-sorted by
            # their own march-length key so trip counts are homogeneous
            # per chunk; gate-free chunks (sky regions, pad lanes) are
            # cond-skipped entirely.
            aux_all = (sh_aux if b_sh is None else jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), sh_aux, b_sh))
            n_primary = sh_aux["gate"].shape[0]
            so, gate = aux_all["origin"], aux_all["gate"]
            spad = (-so.shape[0]) % chunk_size
            if spad:
                so = jnp.concatenate([so, jnp.zeros((spad, 3), so.dtype)])
                gate = jnp.concatenate(
                    [gate, jnp.zeros(spad, bool)])
            sd = jnp.broadcast_to(scene.dir_light_dir, so.shape)
            skey = _scene_hit_key(scene, so, sd)
            skey = jnp.where(gate, skey, jnp.iinfo(jnp.int32).max)
            sperm = jnp.argsort(skey, stable=True)
            # pack origin+gate into ONE 16 B row for the permute: the
            # separate [N,3] f32 + [N] pred gathers measured 90 + 33 ms
            # at the 4.16M-lane combined batch (XProf, frame trace)
            sog = jnp.concatenate([so, gate.astype(jnp.float32)[:, None]],
                                  axis=1)[sperm]
            so_s = sog[:, :3].reshape(-1, chunk_size, 3)
            g_s = (sog[:, 3] > 0.5).reshape(-1, chunk_size)

            def shadow_chunk(x):
                oc1, g1 = x

                def live(_):
                    maxd = jnp.where(g1, DIR_SHADOW_TMAX, -jnp.inf)
                    dd = jnp.broadcast_to(scene.dir_light_dir, oc1.shape)
                    h, _ = march_scene(scene, oc1, dd, maxd, mode.interp)
                    return h.hit

                return jax.lax.cond(
                    jnp.any(g1), live,
                    lambda _: jnp.zeros(oc1.shape[0], bool), None)

            blocked_s = jax.lax.map(shadow_chunk, (so_s, g_s)).reshape(-1)
            # inverse-permutation gather (argsort of the perm) instead
            # of a scatter: XLA TPU scatter runs ~6x slower than a
            # second sort + gather (measured: 183 ms vs ~30 ms @2M)
            blocked = blocked_s[jnp.argsort(sperm)]
            rgb = compose_deferred_shadow(rgb, sh_aux, blocked[:n_primary])
            if b_sh is not None:
                b_rgb = compose_deferred_shadow(
                    b_rgb, b_sh, blocked[n_primary:n_primary
                                         + b_sh["gate"].shape[0]])

        if defer_refl:
            rgb = compose_deferred_reflection(rgb, refl_aux, b_rgb)

        rgb = rgb[:total]
        if perm is not None:
            # inverse perm: sort beats scatter (fwd AND bwd, custom vjp)
            rgb = permute_rows(rgb, jnp.argsort(perm), perm)
    else:
        rgb = trace_radiance(scene, o, d, 0, mode)
    img = tonemap(rgb).reshape(height, width, 3)
    return jnp.concatenate(
        [img, jnp.ones((height, width, 1), jnp.float32)], axis=-1)
