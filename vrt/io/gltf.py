"""glTF 2.0 import — the ``VGLTFImporter`` equivalent, dependency-free.

Parses glTF JSON (.gltf with external/embedded buffers, or binary .glb)
directly and reproduces the reference importer's semantics
(``VOX/Private/GLTFImporter.cpp``):

- positions scaled x100 (glTF meters -> engine centimeters) and re-centered
  by the accessor bounds midpoint (:52-127),
- u16/u32 indices; float POSITION/NORMAL attributes,
- pbr material: baseColor -> albedo, metallic/roughness (:152-166),
- nodes -> object instances with TRS (:173-198),
- nodes named ``Light_Point*`` / ``Light_Spot*`` (else directional) become
  lights with params parsed from the node ``extras`` JSON — keys strength,
  color_r/g/b, attl, attexp, fangle, angle (:203-271).
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from vrt.core.material import Material

_COMPONENT_DTYPES = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
                     5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT4": 16}

SCALE = 100.0  # glTF meters -> engine centimeters


@dataclasses.dataclass
class MeshInfo:
    name: str
    vertices: np.ndarray      # f32 [V,3], scaled + recentered
    normals: np.ndarray       # f32 [V,3]
    indices: np.ndarray       # i64 [3T]
    material: Material
    material_name: str
    offset: np.ndarray        # the recentering offset (scaled units)


@dataclasses.dataclass
class ObjectInfo:
    mesh: int
    position: np.ndarray
    rotation: np.ndarray      # quat xyzw
    scale: np.ndarray


@dataclasses.dataclass
class LightInfo:
    kind: str                 # 'directional' | 'point' | 'spot'
    position: np.ndarray
    rotation: np.ndarray
    intensity: float = 1.0
    color: tuple = (1.0, 1.0, 1.0, 1.0)
    att_l: float = 0.5
    att_exp: float = 0.005
    falloff_angle: float = 20.0
    angle: float = 45.0


@dataclasses.dataclass
class SceneInfo:
    meshes: List[MeshInfo]
    objects: List[ObjectInfo]
    lights: List[LightInfo]


def _load_buffers(doc: Dict, base_dir: str, glb_bin: Optional[bytes]):
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            out.append(open(os.path.join(base_dir, uri), "rb").read())
    return out


def _read_accessor(doc, buffers, acc_id):
    acc = doc["accessors"][acc_id]
    view = doc["bufferViews"][acc["bufferView"]]
    data = buffers[view["buffer"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    count = acc["count"] * _TYPE_COUNTS[acc["type"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride")
    itemsize = np.dtype(dtype).itemsize * _TYPE_COUNTS[acc["type"]]
    if stride and stride != itemsize:
        rows = []
        for i in range(acc["count"]):
            rows.append(np.frombuffer(
                data, dtype, _TYPE_COUNTS[acc["type"]], offset + i * stride))
        arr = np.concatenate(rows)
    else:
        arr = np.frombuffer(data, dtype, count, offset)
    if _TYPE_COUNTS[acc["type"]] > 1:
        arr = arr.reshape(acc["count"], _TYPE_COUNTS[acc["type"]])
    return arr, acc


def _parse_material(doc, mat_id) -> tuple:
    if mat_id is None or "materials" not in doc:
        return Material(), ""
    m = doc["materials"][mat_id]
    pbr = m.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    return Material(albedo=tuple(base),
                    roughness=pbr.get("roughnessFactor", 1.0),
                    metallic=pbr.get("metallicFactor", 1.0)), m.get("name", "")


def load_gltf(path: str) -> SceneInfo:
    base_dir = os.path.dirname(os.path.abspath(path))
    raw = open(path, "rb").read()
    glb_bin = None
    if raw[:4] == b"glTF":  # .glb container
        _, _, total = struct.unpack_from("<III", raw, 0)
        pos = 12
        doc = None
        while pos < total:
            clen, ctype = struct.unpack_from("<II", raw, pos)
            body = raw[pos + 8:pos + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                doc = json.loads(body)
            elif ctype == 0x004E4942:  # BIN
                glb_bin = body
            pos += 8 + clen
    else:
        doc = json.loads(raw)
    buffers = _load_buffers(doc, base_dir, glb_bin)

    meshes: List[MeshInfo] = []
    mesh_of_gltf: Dict[int, int] = {}
    for mi, mesh in enumerate(doc.get("meshes", [])):
        for prim in mesh.get("primitives", []):
            attrs = prim.get("attributes", {})
            if "POSITION" not in attrs or "NORMAL" not in attrs \
                    or "indices" not in prim:
                continue
            pos_arr, pos_acc = _read_accessor(doc, buffers, attrs["POSITION"])
            nrm_arr, _ = _read_accessor(doc, buffers, attrs["NORMAL"])
            idx_arr, idx_acc = _read_accessor(doc, buffers, prim["indices"])
            if idx_acc["componentType"] not in (5123, 5125):
                continue
            pos_arr = pos_arr.astype(np.float32) * SCALE
            if "min" in pos_acc and "max" in pos_acc:
                mn = np.asarray(pos_acc["min"], np.float32) * SCALE
                mx = np.asarray(pos_acc["max"], np.float32) * SCALE
                offset = mx - (mx - mn) * 0.5
            else:
                offset = np.zeros(3, np.float32)
            material, mat_name = _parse_material(doc, prim.get("material"))
            meshes.append(MeshInfo(
                name=mesh.get("name", f"mesh_{mi}"),
                vertices=pos_arr - offset,
                normals=nrm_arr.astype(np.float32),
                indices=idx_arr.astype(np.int64),
                material=material, material_name=mat_name, offset=offset))
            mesh_of_gltf[mi] = len(meshes) - 1
            break  # the reference takes the first primitive per mesh

    objects: List[ObjectInfo] = []
    lights: List[LightInfo] = []
    for node in doc.get("nodes", []):
        name = node.get("name", "")
        t = np.asarray(node.get("translation", [0, 0, 0]), np.float32)
        r = np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32)
        s = np.asarray(node.get("scale", [1, 1, 1]), np.float32)
        if name.startswith("Light"):
            kind = "directional"
            if "_" in name:
                suffix = name.split("_", 1)[1]
                if suffix.startswith("Point"):
                    kind = "point"
                elif suffix.startswith("Spot"):
                    kind = "spot"
            info = LightInfo(kind=kind, position=t * SCALE, rotation=r)
            extras = node.get("extras")
            if isinstance(extras, dict):
                info.intensity = extras.get("strength", info.intensity)
                if all(k in extras for k in ("color_r", "color_g", "color_b")):
                    info.color = (extras["color_r"], extras["color_g"],
                                  extras["color_b"], 1.0)
                info.att_l = extras.get("attl", info.att_l)
                info.att_exp = extras.get("attexp", info.att_exp)
                info.falloff_angle = extras.get("fangle", info.falloff_angle)
                info.angle = extras.get("angle", info.angle)
            lights.append(info)
        elif "mesh" in node and node["mesh"] in mesh_of_gltf:
            mesh_idx = mesh_of_gltf[node["mesh"]]
            offset = meshes[mesh_idx].offset
            objects.append(ObjectInfo(
                mesh=mesh_idx, position=t * SCALE + offset,
                rotation=r, scale=s))
    return SceneInfo(meshes=meshes, objects=objects, lights=lights)
