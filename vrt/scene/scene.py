"""Host-side scene graph — the ``VR/Scene`` layer.

Mirrors ``VScene`` (``VR/Scene/Public/Scene.h:52-161``) and its node types:
``VLevelObject`` (position/rotation/scale), ``VVoxelObject`` (a placed voxel
volume), ``VCamera`` (fov 60, near 0.01, far 125), ``VLight`` directional,
``VPointLight`` (attenuation 0.5 / 0.005), ``VSpotLight`` (angle 45,
falloff 20).  The scene tracks per-frame added/removed volumes for
incremental device sync like ``VRDXScene::SyncWithScene``.

``Scene.to_gpu()`` assembles the device pytree (``vrt.render.gpuscene``);
``vrt.io.voxfile`` serializes/deserializes the whole scene in the
reference's ``.vox`` archive format.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from vrt.core import quat as vq
from vrt.volume.volume import VoxelVolume


@dataclasses.dataclass
class LevelObject:
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: vq.IDENTITY.copy())
    scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32))
    name: str = ""

    def tick(self, dt: float) -> None:  # object model parity (VObject::Tick)
        pass


@dataclasses.dataclass
class VoxelObject(LevelObject):
    volume: Optional[VoxelVolume] = None


@dataclasses.dataclass
class Camera(LevelObject):
    fov: float = 60.0          # VCamera defaults (VR/Scene/Public/Camera.h:29-32)
    near_clip: float = 0.01
    far_clip: float = 125.0
    aspect: float = 1.0


@dataclasses.dataclass
class DirectionalLight(LevelObject):
    color: tuple = (1.0, 1.0, 1.0, 1.0)
    strength: float = 1.0

    @property
    def direction(self) -> np.ndarray:
        return np.asarray(vq.forward_vector(np.asarray(self.rotation)))


@dataclasses.dataclass
class PointLight(DirectionalLight):
    att_linear: float = 0.5    # VPointLight defaults (PointLight.h:26-28)
    att_exp: float = 0.005


@dataclasses.dataclass
class SpotLight(PointLight):
    angle: float = 45.0        # VSpotLight defaults (SpotLight.h:26-30)
    falloff_angle: float = 20.0


class Scene:
    def __init__(self):
        self.objects: List[LevelObject] = []
        self.active_camera: Optional[Camera] = None
        self.active_directional_light: Optional[DirectionalLight] = None
        self.environment: Optional[np.ndarray] = None  # [6,E,E,3]
        self._volumes_added: set = set()
        self._volumes_removed: set = set()

    # -- spawn/destroy (VScene::SpawnObject / DestroyObject) ---------------
    def spawn(self, obj: LevelObject) -> LevelObject:
        self.objects.append(obj)
        if isinstance(obj, Camera) and self.active_camera is None:
            self.active_camera = obj
        if (type(obj) is DirectionalLight
                and self.active_directional_light is None):
            self.active_directional_light = obj
        if isinstance(obj, VoxelObject) and obj.volume is not None:
            self._volumes_added.add(id(obj.volume))
        return obj

    def destroy(self, obj: LevelObject) -> None:
        self.objects.remove(obj)
        if isinstance(obj, VoxelObject) and obj.volume is not None:
            if not any(isinstance(o, VoxelObject) and o.volume is obj.volume
                       for o in self.objects):
                self._volumes_removed.add(id(obj.volume))
        if obj is self.active_camera:
            self.active_camera = None
        if obj is self.active_directional_light:
            self.active_directional_light = None

    # -- queries -----------------------------------------------------------
    @property
    def voxel_objects(self) -> List[VoxelObject]:
        return [o for o in self.objects
                if isinstance(o, VoxelObject) and o.volume is not None]

    @property
    def volumes(self) -> List[VoxelVolume]:
        vols, seen = [], set()
        for o in self.voxel_objects:
            if id(o.volume) not in seen:
                seen.add(id(o.volume))
                vols.append(o.volume)
        return vols

    @property
    def point_lights(self) -> List[PointLight]:
        return [o for o in self.objects if type(o) is PointLight]

    @property
    def spot_lights(self) -> List[SpotLight]:
        return [o for o in self.objects if type(o) is SpotLight]

    def tick(self, dt: float) -> None:
        for o in list(self.objects):
            o.tick(dt)

    def post_render(self) -> None:
        """Clear per-frame dirty/diff state (VScene::PostRender)."""
        self._volumes_added.clear()
        self._volumes_removed.clear()
        for v in self.volumes:
            v.clear_dirty()

    # -- device sync -------------------------------------------------------
    def sync_gpu(self, cached=None):
        """Incremental device sync (``VRDXScene::SyncWithScene``): when no
        volume is dirty and the volume set is unchanged, only the per-frame
        constants (instance transforms, camera, lights) are replaced on the
        cached device scene — volumes/accels/textures are not re-uploaded.
        """
        import dataclasses

        import jax.numpy as jnp

        vols = self.volumes
        ids = tuple(id(v) for v in vols)
        if (cached is None or any(v.dirty for v in vols)
                or getattr(cached, "_vrt_volume_ids", None) != ids
                or cached.num_instances != len(self.voxel_objects)):
            gpu = self.to_gpu()
            object.__setattr__(gpu, "_vrt_volume_ids", ids)
            return gpu

        vol_index = {id(v): i for i, v in enumerate(vols)}
        objs = self.voxel_objects
        ipos = np.stack([np.asarray(o.position, np.float32) for o in objs])
        irot = np.stack([np.asarray(o.rotation, np.float32) for o in objs])
        iscl = np.stack([np.asarray(o.scale, np.float32) for o in objs])
        ivol = np.asarray([vol_index[id(o.volume)] for o in objs], np.int32)
        cam = self.active_camera or Camera()
        dl = self.active_directional_light
        updates = dict(
            inst_pos=jnp.asarray(ipos), inst_rot=jnp.asarray(irot),
            inst_scale=jnp.asarray(iscl), inst_volume=jnp.asarray(ivol),
            cam_pos=jnp.asarray(np.asarray(cam.position, np.float32)),
            cam_rot=jnp.asarray(np.asarray(cam.rotation, np.float32)),
            cam_fov=jnp.asarray(np.float32(cam.fov)))
        if dl is not None:
            updates["dir_light_dir"] = jnp.asarray(
                np.asarray(dl.direction, np.float32))
            updates["dir_light_strength"] = jnp.asarray(
                np.float32(dl.strength))
        gpu = dataclasses.replace(cached, **updates)
        object.__setattr__(gpu, "_vrt_volume_ids", ids)
        return gpu

    def to_gpu(self, pad_volumes_to: Optional[int] = None,
               accel_mode: str = "chebyshev"):
        """Assemble the device scene pytree (``GPUScene``), loading any
        material-referenced textures into the atlas (the DX backend's
        path-keyed geometry texture cache, ``RDXScene.cpp:877-926``).

        ``accel_mode`` defaults to the Chebyshev distance map — bigger
        empty-space skips than the octree skip-level field with IDENTICAL
        hits (equivalence-tested); pass "octree" for reference-traversal
        parity studies."""
        from vrt.render.gpuscene import build_scene
        from vrt.render.textures import build_texture_atlas

        vols = self.volumes
        vol_index = {id(v): i for i, v in enumerate(vols)}
        instances = [dict(volume=vol_index[id(o.volume)],
                          position=o.position, rotation=o.rotation,
                          scale=o.scale)
                     for o in self.voxel_objects]
        cam = self.active_camera or Camera()
        dl = self.active_directional_light
        atlas, sizes, tex_ids = build_texture_atlas(
            [v.material for v in vols])
        return build_scene(
            vols, instances,
            textures=atlas, tex_sizes=sizes, texture_ids=tex_ids,
            camera=dict(position=cam.position, rotation=cam.rotation,
                        fov=cam.fov),
            dir_light=(dict(direction=dl.direction, strength=dl.strength)
                       if dl else None),
            point_lights=[dict(color=p.color, intensity=p.strength,
                               att_linear=p.att_linear, att_exp=p.att_exp,
                               position=p.position)
                          for p in self.point_lights],
            spot_lights=[dict(color=s.color, intensity=s.strength,
                              att_linear=s.att_linear, att_exp=s.att_exp,
                              angle=s.angle, falloff=s.falloff_angle,
                              position=s.position,
                              forward=np.asarray(
                                  vq.forward_vector(np.asarray(s.rotation))))
                         for s in self.spot_lights],
            env=self.environment,
            pad_volumes_to=pad_volumes_to, accel_mode=accel_mode)
