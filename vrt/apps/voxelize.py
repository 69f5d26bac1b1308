"""Voxelizer CLI — the reference's ``Voxelizer.exe`` equivalent.

``python -m vrt.apps.voxelize model.gltf [texturelib.json] [-o out.vox]``

Pipeline (``VOX/Private/Voxelizer.cpp:36-116``): import glTF -> voxelize
each mesh (7-region triangle distance shell) -> assemble a Scene (objects +
lights) -> save ``<stem>.vox`` in the reference archive format.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from vrt.core import quat as vq
from vrt.io.gltf import load_gltf
from vrt.io.voxelize import voxelize_mesh_native
from vrt.io.voxfile import save_scene
from vrt.scene.scene import (DirectionalLight, PointLight, Scene, SpotLight,
                             VoxelObject)


def load_texture_library(path: str) -> dict:
    """``VTextureLibraryImporter`` JSON format
    (``VOX/Private/TextureLibraryImporter.cpp:22-96``)."""
    doc = json.load(open(path))
    out = {}
    for entry in doc.get("materials", []):
        out[entry["material"]] = dict(
            albedo=entry.get("albedo", ""),
            normal=entry.get("normal", ""),
            rm=entry.get("rm", ""),
            tiling=(entry.get("tiling-x", 100.0), entry.get("tiling-y", 100.0)))
    return out


def convert(gltf_path: str, texlib_path: str | None = None,
            out_path: str | None = None, verbose: bool = True) -> str:
    info = load_gltf(gltf_path)
    texlib = load_texture_library(texlib_path) if texlib_path else {}

    scene = Scene()
    volumes = []
    for mesh in info.meshes:
        t0 = time.perf_counter()
        vol = voxelize_mesh_native(mesh.vertices, mesh.indices,
                                   mesh_name=mesh.name,
                                   material=mesh.material)
        if mesh.material_name in texlib:
            tex = texlib[mesh.material_name]
            vol.material.albedo_texture = tex["albedo"]
            vol.material.normal_texture = tex["normal"]
            vol.material.rm_texture = tex["rm"]
            vol.material.texture_scale = tex["tiling"]
        volumes.append(vol)
        if verbose:
            print(f"voxelized {mesh.name}: res {vol.resolution} "
                  f"({vol.n_voxels}^3), extends {vol.extends:.1f}, "
                  f"{len(mesh.indices)//3} tris, "
                  f"{time.perf_counter()-t0:.2f}s", file=sys.stderr)

    for obj in info.objects:
        scene.spawn(VoxelObject(volume=volumes[obj.mesh],
                                position=obj.position, rotation=obj.rotation,
                                scale=obj.scale))
    if not info.objects:  # meshes without nodes still become objects
        for vol in volumes:
            scene.spawn(VoxelObject(volume=vol))

    for li in info.lights:
        if li.kind == "point":
            scene.spawn(PointLight(position=li.position, rotation=li.rotation,
                                   color=li.color, strength=li.intensity,
                                   att_linear=li.att_l, att_exp=li.att_exp))
        elif li.kind == "spot":
            scene.spawn(SpotLight(position=li.position, rotation=li.rotation,
                                  color=li.color, strength=li.intensity,
                                  att_linear=li.att_l, att_exp=li.att_exp,
                                  angle=li.angle,
                                  falloff_angle=li.falloff_angle))
        else:
            scene.spawn(DirectionalLight(position=li.position,
                                         rotation=li.rotation,
                                         color=li.color,
                                         strength=li.intensity))

    if out_path is None:
        out_path = os.path.splitext(gltf_path)[0] + ".vox"
    save_scene(scene, out_path)
    if verbose:
        print(f"wrote {out_path}", file=sys.stderr)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description="glTF -> .vox voxelizer")
    ap.add_argument("gltf")
    ap.add_argument("texlib", nargs="?", default=None)
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)

    from vrt.core.platform import apply_platform_env
    apply_platform_env()
    convert(args.gltf, args.texlib, args.out)


if __name__ == "__main__":
    main()
