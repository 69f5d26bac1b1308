"""Durable BASELINE-config-3 allclose artifact (VERDICT r4 item 8).

Voxelizes the glTF torus through the native C++ 7-region path, renders it
with the production pipeline, renders the SAME scene with the independent
scalar NumPy oracle (tests/numpy_reference.py), and records the pixel
deltas in GOLDEN_GLTF.json — the committed record behind the in-suite
green of tests/test_voxelizer.py::test_voxelized_gltf_render_matches_numpy
(which runs the identical comparison at 32x24 each CI run).

Runs on CPU (the oracle is scalar NumPy; resolution/size kept modest).

Usage: JAX_PLATFORMS=cpu python scripts/golden_gltf.py [--resolution 5]
"""
import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=5)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=54)
    ap.add_argument("--out", default=os.path.join(REPO, "GOLDEN_GLTF.json"))
    args = ap.parse_args()

    from tests import numpy_reference as ref
    from vrt.apps.make_assets import torus_mesh, write_gltf_mesh
    from vrt.apps.voxelize import convert
    from vrt.core import quat as vq
    from vrt.io.voxfile import load_scene
    from vrt.render.gpuscene import RenderMode, build_scene
    from vrt.render.renderer import render_image

    verts, faces = torus_mesh(nu=48, nv=24)
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as tmp:
        gltf = os.path.join(tmp, "scene.gltf")
        write_gltf_mesh(gltf, verts, faces,
                        name=f"torus_{args.resolution}",
                        material={"baseColor": [0.8, 0.4, 0.3, 1.0],
                                  "roughness": 0.6, "metallic": 0.2})
        scene = load_scene(convert(gltf, verbose=False))
    t_vox = time.perf_counter() - t0
    vol = scene.voxel_objects[0].volume
    assert vol.resolution == args.resolution, vol.resolution

    cam_pos = (250.0, 0.0, 120.0)
    cam_rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, -25.0))
    light_dir = np.asarray(vq.forward_vector(
        vq.from_euler_degrees(0.0, 30.0, -40.0)))
    env_color = (0.2, 0.3, 0.5)
    gpu = build_scene(
        [vol], [{"volume": 0}],
        camera=dict(position=cam_pos, rotation=cam_rot, fov=60.0),
        dir_light=dict(direction=light_dir, strength=5.0),
        env=np.full((6, 2, 2, 3), env_color, np.float32))
    w, h = args.width, args.height
    got = np.asarray(render_image(gpu, w, h,
                                  RenderMode(textured=False)))[..., :3]

    t0 = time.perf_counter()
    rvol = ref.Volume(vol.sdf, vol.resolution, vol.extends)
    m = vol.material
    want = ref.render_notex_lit(
        rvol, w, h, cam_pos, cam_rot, 60.0, light_dir, 5.0,
        np.asarray(m.albedo[:3]), m.roughness, m.metallic, env_color)
    t_oracle = time.perf_counter() - t0

    diff = np.abs(got - want)
    report = {
        "config": "BASELINE config 3 (voxelized glTF -> render) vs the "
                  "independent scalar NumPy oracle",
        "mesh_triangles": len(faces) // 3,
        "voxelize_resolution": args.resolution,
        "grid": f"{vol.n_voxels}^3",
        "voxelize_s_native": round(t_vox, 2),
        "image": f"{w}x{h}",
        "oracle_render_s": round(t_oracle, 1),
        "max_abs_delta": round(float(diff.max()), 6),
        "mean_abs_delta": round(float(diff.mean()), 6),
        "q98_abs_delta": round(float(np.quantile(diff, 0.98)), 6),
        "outlier_pixel_frac_gt_0.05": round(
            float((diff.max(axis=-1) > 0.05).mean()), 6),
        "pass": bool(np.quantile(diff, 0.98) < 5e-3
                     and diff.mean() < 2e-3
                     and (diff.max(axis=-1) > 0.05).mean() < 0.01),
        "in_suite_twin":
            "tests/test_voxelizer.py::TestVoxelizedMeshGolden",
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    assert report["pass"], report
    os._exit(0)


if __name__ == "__main__":
    main()
