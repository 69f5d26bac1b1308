"""Differentiable-fit CLI: optimize a voxel SDF (+ per-voxel colors) from
multi-view images of a target scene.

``python -m vrt.apps.fit [--resolution 5] [--views 6] [--steps 200]``

Demonstrates BASELINE config 4: a target scene is rendered from several
cameras; a volume initialized to a sphere is optimized until its renders
match, with pixel gradients flowing through the isosurface (IFT) into the
SDF grid and color field.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from vrt.core import quat as vq
from vrt.core.material import Material
from vrt.diff.fit import fit, render_views
from vrt.render.gpuscene import RenderMode, build_scene
from vrt.volume import sdf as S
from vrt.volume.volume import VoxelVolume


def orbit_cameras(count: int, distance: float = 300.0, height: float = 50.0):
    cams = []
    for i in range(count):
        yaw = 360.0 * i / count
        a = np.deg2rad(yaw)
        pos = np.asarray([distance * np.cos(a), distance * np.sin(a), height],
                         np.float32)
        rot = vq.from_euler_degrees(0.0, 180.0 + yaw, -10.0)
        cams.append(dict(position=pos, rotation=np.asarray(rot), fov=60.0))
    return cams


def main(argv=None):
    ap = argparse.ArgumentParser(description="vrt differentiable fit")
    ap.add_argument("--resolution", type=int, default=4)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--fit-sdf", action="store_true",
                    help="optimize the SDF too (default: colors only)")
    ap.add_argument("--out", default=None, help="save fitted renders as PNG")
    args = ap.parse_args(argv)

    from vrt.core.platform import apply_platform_env
    apply_platform_env()

    import jax.numpy as jnp

    # target: box-with-hole CSG, colored
    csg = S.CSG(shape=S.Box(extends=(45.0, 45.0, 45.0)))
    csg.add_child(S.Sphere(radius=55.0), S.SUBTRACT)
    target_vol = VoxelVolume.from_generator(
        csg, args.resolution, 100.0,
        material=Material(albedo=(0.9, 0.5, 0.2, 1.0)))
    n = target_vol.n_voxels
    rng = np.random.default_rng(0)
    target_colors = rng.uniform(0.2, 0.9, (1, n, n, n, 3)).astype(np.float32)

    def make_scene(vol, colors):
        return build_scene(
            [vol], [{"volume": 0}],
            camera=dict(position=(300.0, 0.0, 0.0),
                        rotation=np.asarray(
                            vq.from_euler_degrees(0.0, 180.0, 0.0))),
            dir_light={"direction": np.asarray(vq.forward_vector(
                vq.from_euler_degrees(0.0, 45.0, -30.0))), "strength": 4.0},
            voxel_colors=colors)

    cams = orbit_cameras(args.views)
    mode = RenderMode()
    target_scene = make_scene(target_vol, target_colors)
    targets = render_views(target_scene, cams, args.size, args.size, mode)
    print("rendered targets", targets.shape, file=sys.stderr)

    start_vol = VoxelVolume.from_generator(
        S.Sphere(radius=60.0), args.resolution, 100.0,
        material=target_vol.material)
    scene = make_scene(start_vol, np.full_like(target_colors, 0.5))
    params = {"voxel_colors": scene.voxel_colors}
    if args.fit_sdf:
        params["sdf"] = scene.volumes.sdf

    params, losses = fit(scene, params, cams, targets, args.size, args.size,
                         mode, steps=args.steps, learning_rate=args.lr,
                         log_every=max(1, args.steps // 10))
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f} "
          f"({losses[-1]/losses[0]:.3%} of start)", file=sys.stderr)

    if args.out:
        from vrt.diff.fit import graft_params, rebuild_accel
        from vrt.io.image import write_png
        fitted = rebuild_accel(graft_params(scene, params))
        imgs = np.asarray(render_views(fitted, cams, args.size, args.size,
                                       mode))
        for i, img in enumerate(imgs):
            write_png(f"{args.out}_view{i}.png",
                      img.reshape(args.size, args.size, 3))
        print(f"wrote {len(imgs)} fitted views to {args.out}_view*.png",
              file=sys.stderr)


if __name__ == "__main__":
    main()
