"""Generate demo assets (the repo ships no Monkey.vox — build our own).

``python -m vrt.apps.make_assets [-o assets/]`` produces:

- ``torus.vox``: a parametric torus mesh voxelized through the full
  glTF-equivalent path (triangle 7-region distance shell) at resolution 6,
  demonstrating the voxelizer on curved geometry,
- ``checker.png``: an albedo texture for triplanar sampling demos.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from vrt.core.material import Material
from vrt.io.image import write_png
from vrt.io.voxelize import voxelize_mesh_native
from vrt.io.voxfile import save_scene
from vrt.scene.scene import DirectionalLight, Scene, VoxelObject
from vrt.core import quat as vq


def torus_mesh(major=60.0, minor=25.0, nu=48, nv=24):
    """Parametric torus triangulation (counter-clockwise outward)."""
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    verts = []
    for u in us:
        for v in vs:
            x = (major + minor * np.cos(v)) * np.cos(u)
            y = (major + minor * np.cos(v)) * np.sin(u)
            z = minor * np.sin(v)
            verts.append((x, y, z))
    verts = np.asarray(verts, np.float64)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [a, b, c, a, c, d]
    return verts, np.asarray(faces, np.int64)


def torus_vertex_normals(verts, major=60.0):
    """Analytic torus normals: radial from the tube's center circle."""
    ring = verts.copy()
    ring[:, 2] = 0.0
    rn = np.linalg.norm(ring, axis=1, keepdims=True)
    center = ring / np.where(rn > 0, rn, 1.0) * major
    n = verts - center
    return (n / np.linalg.norm(n, axis=1, keepdims=True)).astype(np.float32)


def vertex_normals(verts, faces):
    """Area-weighted vertex normals from the triangulation (generic mesh
    default; pass analytic normals to ``write_gltf_mesh`` when known)."""
    verts = np.asarray(verts, np.float64)
    tris = np.asarray(faces, np.int64).reshape(-1, 3)
    fn = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                  verts[tris[:, 2]] - verts[tris[:, 0]])  # 2*area-weighted
    n = np.zeros_like(verts)
    for k in range(3):
        np.add.at(n, tris[:, k], fn)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.where(ln > 0, ln, 1.0)).astype(np.float32)


def write_gltf_mesh(path, verts, faces, name="mesh", material=None,
                    scale=0.01, normals=None):
    """Minimal glTF 2.0 file (one mesh, one node, embedded buffer) in the
    subset ``vrt.io.gltf.load_gltf`` / the reference importer consume:
    POSITION+NORMAL float accessors with min/max, u32 indices, pbr material
    (``VOX/Private/GLTFImporter.cpp:52-166``).  ``scale`` converts engine
    units back to glTF meters (the importer re-applies x100).  ``normals``
    defaults to area-weighted face normals of the triangulation."""
    import base64
    import json

    pos = (np.asarray(verts, np.float32) * scale)
    nrm = (np.asarray(normals, np.float32) if normals is not None
           else vertex_normals(verts, faces))
    idx = np.asarray(faces, np.uint32)
    blob = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    mat = material or {}
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": name, "mesh": 0}],
        "meshes": [{"name": name, "primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"name": mat.get("name", "default"),
                       "pbrMetallicRoughness": {
            "baseColorFactor": mat.get("baseColor", [0.9, 0.6, 0.2, 1.0]),
            "roughnessFactor": mat.get("roughness", 0.5),
            "metallicFactor": mat.get("metallic", 0.1)}}],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes,
             "byteLength": nrm.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes + nrm.nbytes,
             "byteLength": idx.nbytes}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos),
             "type": "VEC3", "min": pos.min(0).tolist(),
             "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": len(nrm),
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5125, "count": len(idx),
             "type": "SCALAR"}],
    }
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def sky_cubemap(edge=32):
    """Simple gradient sky: blue zenith -> pale horizon -> dark ground,
    shaded per face from the sample direction's z (the Skybox.dds stand-in
    — the reference repo ships its skybox as a binary we don't copy)."""
    # face axes in the sampler's +X,-X,+Y,-Y,+Z,-Z layout
    uv = (np.arange(edge, dtype=np.float32) + 0.5) / edge * 2.0 - 1.0
    u, v = np.meshgrid(uv, uv, indexing="xy")
    ones = np.ones_like(u)
    dirs = [np.stack(a, -1) for a in (
        (ones, -u, -v), (-ones, u, -v), (u, ones, -v), (-u, -ones, -v),
        (u, v, ones), (u, -v, -ones))]
    env = np.zeros((6, edge, edge, 3), np.float32)
    zenith = np.array([0.25, 0.45, 0.85], np.float32)
    horizon = np.array([0.75, 0.8, 0.9], np.float32)
    ground = np.array([0.25, 0.22, 0.2], np.float32)
    for f, d in enumerate(dirs):
        n = d / np.linalg.norm(d, axis=-1, keepdims=True)
        z = n[..., 2:3]
        sky = horizon + (zenith - horizon) * np.clip(z, 0, 1)
        env[f] = np.where(z >= 0, sky, horizon + (ground - horizon)
                          * np.clip(-z, 0, 1))
    return env


def checker_texture(size=64, c0=(220, 60, 40), c1=(240, 220, 200)):
    img = np.zeros((size, size, 3), np.uint8)
    t = size // 8
    for y in range(size):
        for x in range(size):
            img[y, x] = c0 if ((x // t) + (y // t)) % 2 == 0 else c1
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="assets")
    ap.add_argument("--resolution", type=int, default=6)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    tex_path = os.path.join(args.out, "checker.png")
    write_png(tex_path, checker_texture())
    print(f"wrote {tex_path}")

    from vrt.io.image import write_dds_cubemap
    sky_path = os.path.join(args.out, "skybox.dds")
    write_dds_cubemap(sky_path, sky_cubemap())
    print(f"wrote {sky_path}")

    verts, faces = torus_mesh()
    vol = voxelize_mesh_native(
        verts, faces, resolution=args.resolution,
        material=Material(albedo=(0.9, 0.6, 0.2, 1.0), roughness=0.5,
                          metallic=0.1))
    scene = Scene()
    scene.spawn(VoxelObject(volume=vol))
    scene.spawn(DirectionalLight(
        rotation=np.asarray(vq.from_euler_degrees(0.0, 45.0, -30.0)),
        strength=6.0))
    out = os.path.join(args.out, "torus.vox")
    save_scene(scene, out)
    print(f"wrote {out} ({os.path.getsize(out)/1e6:.1f} MB, "
          f"res {vol.resolution}, extends {vol.extends:.1f})")


if __name__ == "__main__":
    main()
