"""Device-side scene state — the ``VRDXScene`` equivalent.

Where the DX backend mirrors the scene into descriptor heaps, constant
buffers, BLAS/TLAS and 3D textures (``VR/Renderer/DX/Private/RDXScene.cpp``),
the TPU backend assembles one jit-friendly pytree of stacked device arrays:

- volumes stacked over a leading V axis (padded to a common resolution),
- per-volume geometry constants (the ``VGeometryConstantBuffer`` fields:
  tint, roughness, metallic, k, texture ids/scale),
- instances = scene objects: volume index + rotate-scale-translate transform
  (the reference composes ``rotation * scale * translation`` in row-vector
  convention, i.e. world = diag(scale) . R(v) + position,
  ``VR/Renderer/DX/Private/RDXLevelObject.cpp:29-50``),
- light banks fixed at the shader ABI limits (5 point + 5 spot,
  ``SH/RaytracingHlsl.h:112-114``) with dynamic counts,
- a texture atlas + environment cube map.

Instance/volume counts are static (compile-time) like the reference's
``MaxAllowedObjectData`` = 20; scenes smaller than the static size mask
inactive instances.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vrt.core import quat as vq
from vrt.march.types import DeviceVolume

MAX_POINT_LIGHTS = 5
MAX_SPOT_LIGHTS = 5
MAX_OBJECTS = 20


@dataclasses.dataclass(frozen=True)
class RenderMode:
    """The 8 pipeline variants of ``EVRenderMode``
    (``VR/Renderer/Public/Renderer.h:32-42``) as orthogonal flags."""

    interp: bool = True
    textured: bool = True
    lit: bool = True
    # SHADER_DEBUG equivalent: draw collapsed-octree node bounds unlit red
    debug_overlay: bool = False

    @classmethod
    def from_enum(cls, mode: int) -> "RenderMode":
        # 0 Interp, 1 Interp_Unlit, 2 Interp_NoTex, 3 Interp_NoTex_Unlit,
        # 4 Cube, 5 Cube_Unlit, 6 Cube_NoTex, 7 Cube_NoTex_Unlit
        interp = mode < 4
        notex = (mode % 4) >= 2
        unlit = (mode % 2) == 1
        return cls(interp=interp, textured=not notex, lit=not unlit)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPUScene:
    """Device scene.  ``num_point``/``num_spot``/``any_reflective`` are
    *static* (python) fields — changing them triggers recompilation, the
    analogue of the reference rebuilding pipeline state objects."""

    volumes: DeviceVolume           # stacked, leading axis V

    # per-volume geometry constants (VGeometryConstantBuffer)
    tint: jax.Array                 # f32 [V,4]
    roughness: jax.Array            # f32 [V]
    metallic: jax.Array             # f32 [V]
    k: jax.Array                    # f32 [V]
    tex_scale: jax.Array            # f32 [V,2]
    albedo_tex: jax.Array           # i32 [V]
    normal_tex: jax.Array           # i32 [V]
    rm_tex: jax.Array               # i32 [V]

    # instances (TLAS entries)
    inst_volume: jax.Array          # i32 [I]
    inst_pos: jax.Array             # f32 [I,3]
    inst_rot: jax.Array             # f32 [I,4] quaternion
    inst_scale: jax.Array           # f32 [I,3]
    inst_active: jax.Array          # bool [I]

    # camera
    cam_pos: jax.Array              # f32 [3]
    cam_rot: jax.Array              # f32 [4]
    cam_fov: jax.Array              # f32 [] vertical fov degrees

    # directional light
    dir_light_dir: jax.Array        # f32 [3] (rotation forward vector)
    dir_light_strength: jax.Array   # f32 []

    # point lights
    point_color: jax.Array          # f32 [5,4]
    point_intensity: jax.Array      # f32 [5]
    point_att_l: jax.Array          # f32 [5]
    point_att_e: jax.Array          # f32 [5]
    point_pos: jax.Array            # f32 [5,3]

    # spot lights
    spot_color: jax.Array           # f32 [5,4]
    spot_intensity: jax.Array       # f32 [5]
    spot_att_l: jax.Array           # f32 [5]
    spot_att_e: jax.Array           # f32 [5]
    spot_cos_angle: jax.Array       # f32 [5]
    spot_cos_falloff: jax.Array     # f32 [5]
    spot_pos: jax.Array             # f32 [5,3]
    spot_fwd: jax.Array             # f32 [5,3]

    # textures
    textures: jax.Array             # f32 [T,TH,TW,3]
    tex_sizes: jax.Array            # i32 [T,2] (h,w)
    env: jax.Array                  # f32 [6,E,E,3]

    # per-voxel color field (differentiable-fit extension; no reference
    # counterpart — the reference's albedo is per-volume tint * texture).
    # Dummy [V,1,1,1,3] when unused.
    voxel_colors: jax.Array = None  # f32 [V,N,N,N,3]
    # corner-packed view of voxel_colors (see pack_voxel_color_corners):
    # one row gather per albedo sample.  None falls back to 8 voxel
    # gathers; kept in sync by build_scene / vrt.diff.fit.graft_params.
    voxel_color_corners: jax.Array | None = None  # [V,N,N,N,8,3]

    # static pipeline-shaping fields
    num_point: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_spot: int = dataclasses.field(metadata=dict(static=True), default=0)
    any_reflective: bool = dataclasses.field(metadata=dict(static=True),
                                             default=False)
    use_voxel_colors: bool = dataclasses.field(metadata=dict(static=True),
                                               default=False)

    @property
    def num_instances(self) -> int:
        return self.inst_volume.shape[0]


# Corner-packed colors pay off when the RAY count is large relative to
# the grid: the packed table re-packs in-jit per fit step (differentiable
# slices over the whole grid), so its cost scales with grid size while
# its gather/scatter savings scale with rays.  Measured: config6 (2M rays,
# 65^3 grid, 52 MB packed) fit step 2638 -> 1830 ms; config4 (131k rays,
# 257^3 grid, 815 MB packed) REGRESSED 430 -> 1057 ms.  Budget excludes
# the 257^3-scale tables.
COLOR_CORNER_BUDGET_BYTES = 256_000_000


def pack_voxel_color_corners(colors, dtype=None):
    """[V,N,N,N,3] per-voxel colors -> [V,N,N,N,8,3] per-cell corner rows
    (VOXEL_COORDS order) with one zero pad plane, so the trilinear albedo
    sample reads ONE contiguous row per hit cell — and its backward issues
    ONE row scatter — instead of 8 scattered voxel gathers (measured: the
    8-row colors cotangent scatter alone was ~495 ms of the 1080p fit
    backward, scripts/probe_backward_trace.py).  The pad plane makes
    corners outside the padded grid contribute zero, matching the
    per-corner valid mask of the unpacked path; corners beyond a volume's
    live n^3 region are masked by the sampler either way.  Works on numpy
    and traced arrays (stack of static slices) so fitting re-packs in-jit.
    """
    from vrt.march.isosurface import CORNERS

    xp = jnp if isinstance(colors, jax.Array) else np
    dtype = dtype or colors.dtype
    n = colors.shape[1]
    cp = xp.pad(colors, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    chans = [cp[:, dx:dx + n, dy:dy + n, dz:dz + n]
             for dx, dy, dz in CORNERS]
    return xp.stack(chans, axis=-2).astype(dtype)


def _default_textures():
    """Texture slot 0 = 1x1 white (albedo/RM default), slot 1 = flat normal,
    mirroring the DX default textures (``RDXScene.cpp:241-272``)."""
    tex = np.ones((2, 1, 1, 3), np.float32)
    tex[1, 0, 0] = (0.5, 0.5, 1.0)
    sizes = np.ones((2, 2), np.int32)
    return jnp.asarray(tex), jnp.asarray(sizes)


def build_scene(volumes: Sequence,  # VoxelVolume
                instances: Sequence[dict],
                camera: dict,
                dir_light: dict | None = None,
                point_lights: Sequence[dict] = (),
                spot_lights: Sequence[dict] = (),
                env: np.ndarray | None = None,
                textures: np.ndarray | None = None,
                tex_sizes: np.ndarray | None = None,
                texture_ids: Sequence[tuple] | None = None,
                voxel_colors: np.ndarray | None = None,
                pad_volumes_to: int | None = None,
                quantize_densities: bool = False,
                accel_mode: str = "octree",
                march_dtype=None) -> GPUScene:
    """Assemble a GPUScene from host data.

    instances: dicts {volume: int, position, rotation(quat xyzw), scale}.
    camera: {position, rotation, fov} (fov degrees, default 60 per VCamera).
    dir_light: {rotation or direction, strength}.
    point/spot light dicts mirror VPointLight/VSpotLight fields; spot angles
    are half-angle cosines cos(angle/2), cos(falloff/2)
    (``DXLightFactory.cpp:20-50``).
    """
    assert len(volumes) >= 1
    if quantize_densities:
        # emulate the DX backend's 15-bit sign-magnitude fixed-point density
        # encoding for bit-level image comparison with the reference
        # (RDXVoxelVolume.cpp:399-421)
        from vrt.core.grid import quantize_density_like_reference
        from vrt.volume.volume import VoxelVolume as _VV

        volumes = [
            _VV(v.resolution, v.extends, material=v.material,
                sdf=np.asarray(quantize_density_like_reference(v.sdf)),
                voxel_materials=v.voxel_materials)
            for v in volumes]
    n_max = pad_volumes_to or max(v.n_voxels for v in volumes)
    # Volumes stack into one gather table; the fused-fetch VMEM budget is
    # therefore shared across them (see DeviceVolume.from_volume).
    budget = DeviceVolume.FUSE_BUDGET_BYTES // max(1, len(volumes))
    dvs = [DeviceVolume.from_volume(v, pad_to=n_max, accel_mode=accel_mode,
                                    march_dtype=march_dtype,
                                    fuse_budget_bytes=budget)
           for v in volumes]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *dvs)

    vcount = len(volumes)
    tint = np.zeros((vcount, 4), np.float32)
    rough = np.zeros(vcount, np.float32)
    metal = np.zeros(vcount, np.float32)
    kk = np.zeros(vcount, np.float32)
    tsc = np.ones((vcount, 2), np.float32)
    a_tex = np.zeros(vcount, np.int32)
    n_tex = np.ones(vcount, np.int32)
    rm_tex = np.zeros(vcount, np.int32)
    for i, v in enumerate(volumes):
        m = v.material
        tint[i] = m.albedo
        rough[i] = m.roughness
        metal[i] = m.metallic
        kk[i] = m.k
        tsc[i] = m.texture_scale
        if texture_ids is not None:
            a_tex[i], n_tex[i], rm_tex[i] = texture_ids[i]

    n_inst = len(instances)
    iv = np.zeros(n_inst, np.int32)
    ipos = np.zeros((n_inst, 3), np.float32)
    irot = np.tile(vq.IDENTITY, (n_inst, 1))
    iscl = np.ones((n_inst, 3), np.float32)
    for i, inst in enumerate(instances):
        iv[i] = inst["volume"]
        ipos[i] = inst.get("position", (0, 0, 0))
        irot[i] = inst.get("rotation", vq.IDENTITY)
        iscl[i] = inst.get("scale", (1, 1, 1))

    cam_rot = np.asarray(camera.get("rotation", vq.IDENTITY), np.float32)
    cam_pos = np.asarray(camera.get("position", (0, 0, 0)), np.float32)
    cam_fov = np.float32(camera.get("fov", 60.0))

    if dir_light is None:
        dl_dir = np.asarray(vq.FORWARD, np.float32)
        dl_strength = np.float32(0.0)
    else:
        if "direction" in dir_light:
            dl_dir = np.asarray(dir_light["direction"], np.float32)
        else:
            dl_dir = np.asarray(
                vq.forward_vector(np.asarray(dir_light["rotation"],
                                             np.float32)), np.float32)
        dl_strength = np.float32(dir_light.get("strength", 0.0))

    pc = np.zeros((MAX_POINT_LIGHTS, 4), np.float32)
    pi = np.zeros(MAX_POINT_LIGHTS, np.float32)
    pal = np.zeros(MAX_POINT_LIGHTS, np.float32)
    pae = np.zeros(MAX_POINT_LIGHTS, np.float32)
    pp = np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
    for i, pl in enumerate(point_lights[:MAX_POINT_LIGHTS]):
        pc[i] = pl.get("color", (1, 1, 1, 1))
        pi[i] = pl.get("intensity", 1.0)
        pal[i] = pl.get("att_linear", 0.5)     # VPointLight defaults
        pae[i] = pl.get("att_exp", 0.005)
        pp[i] = pl.get("position", (0, 0, 0))

    sc = np.zeros((MAX_SPOT_LIGHTS, 4), np.float32)
    si = np.zeros(MAX_SPOT_LIGHTS, np.float32)
    sal = np.zeros(MAX_SPOT_LIGHTS, np.float32)
    sae = np.zeros(MAX_SPOT_LIGHTS, np.float32)
    sca = np.zeros(MAX_SPOT_LIGHTS, np.float32)
    scf = np.zeros(MAX_SPOT_LIGHTS, np.float32)
    sp = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    sf = np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    for i, sl in enumerate(spot_lights[:MAX_SPOT_LIGHTS]):
        sc[i] = sl.get("color", (1, 1, 1, 1))
        si[i] = sl.get("intensity", 1.0)
        sal[i] = sl.get("att_linear", 0.5)
        sae[i] = sl.get("att_exp", 0.005)
        angle = np.deg2rad(sl.get("angle", 45.0))
        falloff = np.deg2rad(sl.get("falloff", 20.0))
        sca[i] = np.cos(angle / 2.0)
        scf[i] = np.cos(falloff / 2.0)
        sp[i] = sl.get("position", (0, 0, 0))
        if "forward" in sl:
            sf[i] = sl["forward"]
        else:
            sf[i] = np.asarray(vq.forward_vector(
                np.asarray(sl.get("rotation", vq.IDENTITY), np.float32)),
                np.float32)

    if textures is None:
        tex, sizes = _default_textures()
    else:
        tex = jnp.asarray(textures, jnp.float32)
        sizes = jnp.asarray(tex_sizes, jnp.int32)

    if env is None:
        env = np.zeros((6, 1, 1, 3), np.float32)

    return GPUScene(
        volumes=stacked,
        tint=jnp.asarray(tint), roughness=jnp.asarray(rough),
        metallic=jnp.asarray(metal), k=jnp.asarray(kk),
        tex_scale=jnp.asarray(tsc), albedo_tex=jnp.asarray(a_tex),
        normal_tex=jnp.asarray(n_tex), rm_tex=jnp.asarray(rm_tex),
        inst_volume=jnp.asarray(iv), inst_pos=jnp.asarray(ipos),
        inst_rot=jnp.asarray(irot, jnp.float32), inst_scale=jnp.asarray(iscl),
        inst_active=jnp.ones(n_inst, bool),
        cam_pos=jnp.asarray(cam_pos), cam_rot=jnp.asarray(cam_rot),
        cam_fov=jnp.asarray(cam_fov),
        dir_light_dir=jnp.asarray(dl_dir),
        dir_light_strength=jnp.asarray(dl_strength),
        point_color=jnp.asarray(pc), point_intensity=jnp.asarray(pi),
        point_att_l=jnp.asarray(pal), point_att_e=jnp.asarray(pae),
        point_pos=jnp.asarray(pp),
        spot_color=jnp.asarray(sc), spot_intensity=jnp.asarray(si),
        spot_att_l=jnp.asarray(sal), spot_att_e=jnp.asarray(sae),
        spot_cos_angle=jnp.asarray(sca), spot_cos_falloff=jnp.asarray(scf),
        spot_pos=jnp.asarray(sp), spot_fwd=jnp.asarray(sf),
        textures=tex, tex_sizes=sizes, env=jnp.asarray(env, jnp.float32),
        voxel_colors=(jnp.asarray(voxel_colors, jnp.float32)
                      if voxel_colors is not None
                      else jnp.zeros((vcount, 1, 1, 1, 3), jnp.float32)),
        voxel_color_corners=(
            jnp.asarray(pack_voxel_color_corners(
                np.asarray(voxel_colors, np.float32),
                dtype=np.dtype(march_dtype) if march_dtype else None))
            if (voxel_colors is not None
                and np.asarray(voxel_colors).size * 8
                * np.dtype(march_dtype or np.float32).itemsize
                <= COLOR_CORNER_BUDGET_BYTES) else None),
        use_voxel_colors=voxel_colors is not None,
        num_point=min(len(point_lights), MAX_POINT_LIGHTS),
        num_spot=min(len(spot_lights), MAX_SPOT_LIGHTS),
        any_reflective=bool(any(v.material.roughness < 0.3
                                for v in volumes)))
