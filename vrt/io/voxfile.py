"""``.vox`` scene archive codec — binary-compatible with the reference.

Format (``VR/Core/Private/SerializationManager.cpp:22-106``): a recursive
archive node is

    u64  buffer_size          (little-endian size_t)
    u8   buffer[buffer_size]
    u64  num_properties
    per property:
        u64  name_length       (strlen + 1, includes the NUL)
        char name[name_length] (NUL-terminated)
        <child archive>

Scene layout (``VR/Scene/Private/Scene.cpp:314-545``): properties
``VCount``, ``V_i`` (volumes), ``OCount``, ``OI_i``/``O_i`` (objects +
volume indices), ``LDCount``/``LD_i``, ``LPCount``/``LP_i``,
``LSCount``/``LS_i`` (directional/point/spot lights).

Volume archives (``VVoxelVolume::Serialize``) carry the raw voxel buffer —
8 bytes per voxel ``{u8 material, 3 pad, f32 density}`` (MSVC layout of
``VVoxel``) in the x-major/z/y flat order — plus Resolution (u8),
Extends (f32) and a Material archive.  Structs are raw little-endian
memcpys: VVector = 3xf32, VQuat = (x,y,z,w) f32, VColor = 4xf32,
VVector2D = 2xf32.

Note: the reference *writer* stores the albedo path into the ``RMTexture``
property (``Material.cpp`` writes ``AlbedoTexturePath`` into rmArchive) —
we write the actual RM path; the reader accepts both.
"""

from __future__ import annotations

import io
import struct
from typing import Dict, Optional, Tuple

import numpy as np

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.scene.scene import (DirectionalLight, PointLight, Scene, SpotLight,
                             VoxelObject)
from vrt.volume.volume import VoxelVolume


class Archive:
    """One recursive archive node."""

    __slots__ = ("buffer", "props")

    def __init__(self, buffer: bytes = b"", props: Optional[Dict] = None):
        self.buffer = buffer
        self.props: Dict[str, "Archive"] = props or {}

    # -- typed helpers -----------------------------------------------------
    @classmethod
    def from_bytes(cls, b: bytes) -> "Archive":
        return cls(buffer=b)

    @classmethod
    def from_scalar(cls, fmt: str, value) -> "Archive":
        return cls(buffer=struct.pack("<" + fmt, value))

    def scalar(self, fmt: str):
        return struct.unpack_from("<" + fmt, self.buffer)[0]

    @classmethod
    def from_string(cls, s: str) -> "Archive":
        return cls(buffer=s.encode("utf-8") + b"\x00")

    def string(self) -> str:
        return self.buffer.split(b"\x00", 1)[0].decode("utf-8", "replace")

    @classmethod
    def from_floats(cls, *vals) -> "Archive":
        return cls(buffer=struct.pack("<%df" % len(vals), *vals))

    def floats(self, count: int) -> Tuple[float, ...]:
        return struct.unpack_from("<%df" % count, self.buffer)


def _write_node(a: Archive, out: io.BufferedIOBase) -> None:
    out.write(struct.pack("<Q", len(a.buffer)))
    if a.buffer:
        out.write(a.buffer)
    out.write(struct.pack("<Q", len(a.props)))
    for name, child in a.props.items():
        nb = name.encode("utf-8") + b"\x00"
        out.write(struct.pack("<Q", len(nb)))
        out.write(nb)
        _write_node(child, out)


def _read_node(inp: io.BufferedIOBase) -> Archive:
    (size,) = struct.unpack("<Q", inp.read(8))
    buf = inp.read(size) if size else b""
    (nprops,) = struct.unpack("<Q", inp.read(8))
    a = Archive(buffer=buf)
    for _ in range(nprops):
        (nlen,) = struct.unpack("<Q", inp.read(8))
        name = inp.read(nlen).split(b"\x00", 1)[0].decode("utf-8", "replace")
        a.props[name] = _read_node(inp)
    return a


def save_archive(a: Archive, path: str) -> None:
    with open(path, "wb") as f:
        _write_node(a, f)


def load_archive(path: str) -> Archive:
    with open(path, "rb") as f:
        return _read_node(f)


# ---------------------------------------------------------------------------
# Volume <-> archive
# ---------------------------------------------------------------------------

_VOXEL_DTYPE = np.dtype([("material", np.uint8), ("pad", np.uint8, 3),
                         ("density", "<f4")])


def volume_to_archive(vol: VoxelVolume) -> Archive:
    n = vol.n_voxels
    flat = np.zeros(n * n * n, _VOXEL_DTYPE)
    # reference flat order is x-major, then z, then y
    flat["material"] = np.ascontiguousarray(
        vol.voxel_materials.transpose(0, 2, 1)).reshape(-1)
    flat["density"] = np.ascontiguousarray(
        vol.sdf.transpose(0, 2, 1)).reshape(-1)
    a = Archive(buffer=flat.tobytes())
    a.props["Resolution"] = Archive.from_scalar("B", vol.resolution)
    a.props["Extends"] = Archive.from_scalar("f", vol.extends)
    a.props["Material"] = material_to_archive(vol.material)
    return a


def archive_to_volume(a: Archive) -> VoxelVolume:
    resolution = a.props["Resolution"].scalar("B")
    extends = a.props["Extends"].scalar("f")
    n = (1 << resolution) + 1
    flat = np.frombuffer(a.buffer, _VOXEL_DTYPE, count=n * n * n)
    sdf = flat["density"].reshape(n, n, n).transpose(0, 2, 1)
    mats = flat["material"].reshape(n, n, n).transpose(0, 2, 1)
    mat = archive_to_material(a.props["Material"]) if "Material" in a.props \
        else Material()
    return VoxelVolume(resolution, extends, material=mat,
                       sdf=np.ascontiguousarray(sdf),
                       voxel_materials=np.ascontiguousarray(mats))


def material_to_archive(m: Material) -> Archive:
    a = Archive()
    a.props["Color"] = Archive.from_floats(*m.albedo)
    a.props["Roughness"] = Archive.from_scalar("f", m.roughness)
    a.props["Metallic"] = Archive.from_scalar("f", m.metallic)
    a.props["TextureScale"] = Archive.from_floats(*m.texture_scale)
    a.props["AlbedoTexture"] = Archive.from_string(m.albedo_texture)
    a.props["NormalTexture"] = Archive.from_string(m.normal_texture)
    a.props["RMTexture"] = Archive.from_string(m.rm_texture)
    return a


def archive_to_material(a: Archive) -> Material:
    return Material(
        albedo=a.props["Color"].floats(4),
        roughness=a.props["Roughness"].scalar("f"),
        metallic=a.props["Metallic"].scalar("f"),
        texture_scale=a.props["TextureScale"].floats(2),
        albedo_texture=a.props["AlbedoTexture"].string(),
        normal_texture=a.props["NormalTexture"].string(),
        rm_texture=a.props["RMTexture"].string())


# ---------------------------------------------------------------------------
# Scene <-> archive
# ---------------------------------------------------------------------------

def _trs_archive(obj) -> Archive:
    a = Archive()
    a.props["Position"] = Archive.from_floats(*np.asarray(obj.position,
                                                          np.float32))
    a.props["Scale"] = Archive.from_floats(*np.asarray(obj.scale, np.float32))
    a.props["Rotation"] = Archive.from_floats(*np.asarray(obj.rotation,
                                                          np.float32))
    return a


def _read_trs(a: Archive, obj) -> None:
    obj.position = np.asarray(a.props["Position"].floats(3), np.float32)
    obj.scale = np.asarray(a.props["Scale"].floats(3), np.float32)
    obj.rotation = np.asarray(a.props["Rotation"].floats(4), np.float32)


def _light_archive(light) -> Archive:
    a = _trs_archive(light)
    a.props["Color"] = Archive.from_floats(*light.color)
    a.props["Strength"] = Archive.from_scalar("f", light.strength)
    if isinstance(light, PointLight):
        a.props["AttL"] = Archive.from_scalar("f", light.att_linear)
        a.props["AttExp"] = Archive.from_scalar("f", light.att_exp)
    if isinstance(light, SpotLight):
        a.props["AngleF"] = Archive.from_scalar("f", light.falloff_angle)
        a.props["Angle"] = Archive.from_scalar("f", light.angle)
    return a


def _read_light(a: Archive, light):
    _read_trs(a, light)
    light.color = a.props["Color"].floats(4)
    light.strength = a.props["Strength"].scalar("f")
    if isinstance(light, PointLight):
        light.att_linear = a.props["AttL"].scalar("f")
        light.att_exp = a.props["AttExp"].scalar("f")
    if isinstance(light, SpotLight):
        light.falloff_angle = a.props["AngleF"].scalar("f")
        light.angle = a.props["Angle"].scalar("f")
    return light


def scene_to_archive(scene: Scene) -> Archive:
    a = Archive()
    vols = scene.volumes
    vol_index = {id(v): i for i, v in enumerate(vols)}

    a.props["VCount"] = Archive.from_scalar("Q", len(vols))
    for i, v in enumerate(vols):
        a.props["V_%d" % i] = volume_to_archive(v)

    objs = scene.voxel_objects
    a.props["OCount"] = Archive.from_scalar("Q", len(objs))
    for i, o in enumerate(objs):
        a.props["OI_%d" % i] = Archive.from_scalar("Q", vol_index[id(o.volume)])
        a.props["O_%d" % i] = _trs_archive(o)

    dls = ([scene.active_directional_light]
           if scene.active_directional_light else [])
    a.props["LDCount"] = Archive.from_scalar("Q", len(dls))
    for i, l in enumerate(dls):
        a.props["LD_%d" % i] = _light_archive(l)

    pls = scene.point_lights
    a.props["LPCount"] = Archive.from_scalar("Q", len(pls))
    for i, l in enumerate(pls):
        a.props["LP_%d" % i] = _light_archive(l)

    sls = scene.spot_lights
    a.props["LSCount"] = Archive.from_scalar("Q", len(sls))
    for i, l in enumerate(sls):
        a.props["LS_%d" % i] = _light_archive(l)
    return a


def archive_to_scene(a: Archive) -> Scene:
    scene = Scene()
    vcount = a.props["VCount"].scalar("Q")
    vols = [archive_to_volume(a.props["V_%d" % i]) for i in range(vcount)]

    ocount = a.props["OCount"].scalar("Q")
    for i in range(ocount):
        vi = a.props["OI_%d" % i].scalar("Q")
        obj = VoxelObject(volume=vols[vi])
        _read_trs(a.props["O_%d" % i], obj)
        scene.spawn(obj)

    for i in range(a.props["LDCount"].scalar("Q")):
        scene.spawn(_read_light(a.props["LD_%d" % i], DirectionalLight()))
    for i in range(a.props["LPCount"].scalar("Q")):
        scene.spawn(_read_light(a.props["LP_%d" % i], PointLight()))
    for i in range(a.props["LSCount"].scalar("Q")):
        scene.spawn(_read_light(a.props["LS_%d" % i], SpotLight()))
    return scene


def save_scene(scene: Scene, path: str) -> None:
    save_archive(scene_to_archive(scene), path)


def load_scene(path: str) -> Scene:
    return archive_to_scene(load_archive(path))
