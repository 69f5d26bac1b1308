"""TRUE multi-process distribution check (SURVEY §2.11 item 4).

Spawns N localhost CPU processes, each owning one XLA CPU device, brings
them up with ``jax.distributed.initialize`` (collectives ride Gloo — the
DCN stand-in), and runs

1. one data-parallel fit step (``make_fit_step_dp``) over an (N,1) mesh,
2. one slab-sharded fit step (``make_slab_fit_step``) over a (1,N) mesh —
   halo ppermute + closest-hit psum + ray all_gather all cross PROCESS
   boundaries, not just devices,

then asserts parity with the same steps in a fresh single-process run.

Usage:  python scripts/multiprocess_fit.py [--nprocs 2]
Exit 0 + one JSON line on success.  tests/test_multiprocess.py wraps this.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _compute(n_data: int, n_model: int):
    """One DP fit step + one slab fit step on the current process topology.
    Returns dict of losses/checksums (replicated scalars)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from vrt.core import quat as vq
    from vrt.core.material import Material
    from vrt.dist.brick import shard_volume
    from vrt.dist.mesh import make_render_mesh
    from vrt.dist.sharding import make_fit_step_dp
    from vrt.dist.slab_render import default_fit_scene, make_slab_fit_step
    from vrt.render.camera import camera_rays
    from vrt.render.gpuscene import RenderMode, build_scene
    from vrt.volume import sdf as S
    from vrt.volume.volume import VoxelVolume

    vol = VoxelVolume.from_generator(
        S.Sphere(radius=60.0), 3, 100.0,
        material=Material(albedo=(0.8, 0.4, 0.3, 1.0), roughness=0.7))
    cam_rot = np.asarray(vq.from_euler_degrees(0.0, 180.0, 0.0))
    light = np.asarray(vq.forward_vector(
        vq.from_euler_degrees(0.0, 45.0, -30.0)))
    o, d = camera_rays(jnp.asarray([300.0, 0.0, 0.0], jnp.float32),
                       jnp.asarray(cam_rot, jnp.float32),
                       jnp.asarray(60.0, jnp.float32), 16, 16)
    o, d = np.asarray(o), np.asarray(d)
    targets = np.full((o.shape[0], 3), 0.35, np.float32)
    mode = RenderMode()
    out = {}

    # ---- data-parallel step over (n_data, 1) --------------------------
    mesh = make_render_mesh(n_data, 1)
    rep = NamedSharding(mesh, P())
    shr = NamedSharding(mesh, P(("data", "model")))
    scene = build_scene(
        [vol], [{"volume": 0}],
        camera=dict(position=(300.0, 0.0, 0.0), rotation=cam_rot),
        dir_light=dict(direction=light, strength=5.0),
        env=np.full((6, 2, 2, 3), (0.2, 0.3, 0.5), np.float32))
    params = {"sdf": scene.volumes.sdf}
    opt = optax.sgd(1e-2)
    step = make_fit_step_dp(mode, mesh, opt)
    params_g = jax.device_put(params, rep)
    scene_g = jax.device_put(scene, rep)
    state_g = jax.device_put(opt.init(params), rep)
    og = jax.device_put(jnp.asarray(o), shr)
    dg = jax.device_put(jnp.asarray(d), shr)
    tg = jax.device_put(jnp.asarray(targets), shr)
    params2, _, loss = step(params_g, state_g, scene_g, og, dg, tg)
    out["dp_loss"] = float(loss)
    out["dp_param_sum"] = float(jnp.sum(params2["sdf"]))

    # ---- slab-sharded step over (1, n_model) --------------------------
    mesh_m = make_render_mesh(1, n_model)
    rep_m = NamedSharding(mesh_m, P())
    slab_s = NamedSharding(mesh_m, P("model"))
    slabs = shard_volume(vol, n_model)
    fit_scene = default_fit_scene(vol.n_voxels, vol.cell_size, vol.extends,
                                  light)
    opt_m = optax.sgd(1e-2)
    sstep = make_slab_fit_step(mesh_m, opt_m, fit_scene)
    sparams = jax.device_put(slabs.sdf, slab_s)
    sstate = jax.device_put(opt_m.init(slabs.sdf), slab_s)
    slabs_g = jax.device_put(slabs, slab_s)
    og = jax.device_put(jnp.asarray(o), slab_s)
    dg = jax.device_put(jnp.asarray(d), slab_s)
    tg = jax.device_put(jnp.asarray(targets), slab_s)
    sparams2, _, sloss = sstep(sparams, sstate, slabs_g, og, dg, tg)
    out["slab_loss"] = float(sloss)
    out["slab_param_sum"] = float(jnp.sum(sparams2))

    # ---- CROSSED (data x model) step over (n/2, 2): DP psum AND slab
    # ppermute/all_gather cross process boundaries in the SAME step ------
    if n_data >= 4 and n_data % 2 == 0:
        from vrt.dist.slab_render import make_slab_fit_step_crossed

        mesh_x = make_render_mesh(n_data // 2, 2)
        slab_x = NamedSharding(mesh_x, P("model"))
        ray_x = NamedSharding(mesh_x, P(("data", "model")))
        slabs2 = shard_volume(vol, 2)
        opt_x = optax.sgd(1e-2)
        xstep = make_slab_fit_step_crossed(mesh_x, opt_x, fit_scene)
        xparams = jax.device_put(slabs2.sdf, slab_x)
        xstate = jax.device_put(opt_x.init(slabs2.sdf), slab_x)
        slabs2_g = jax.device_put(slabs2, slab_x)
        og = jax.device_put(jnp.asarray(o), ray_x)
        dg = jax.device_put(jnp.asarray(d), ray_x)
        tg = jax.device_put(jnp.asarray(targets), ray_x)
        xparams2, _, xloss = xstep(xparams, xstate, slabs2_g, og, dg, tg)
        out["crossed_loss"] = float(xloss)
        out["crossed_param_sum"] = float(jnp.sum(xparams2))
    return out


def run_child(pid: int, nprocs: int, port: int, out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs, len(jax.devices())
    out = _compute(n_data=nprocs, n_model=nprocs)
    out["process_count"] = nprocs
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(out, f)
    sys.stdout.flush()
    os._exit(0)  # skip teardown


def run_ref(out_path: str, nprocs: int):
    # Single-PROCESS reference on the same device count (virtual devices)
    # and the same mesh topology: layouts and reduce orders match the
    # multi-process run exactly, so parity is tight.
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = _compute(n_data=nprocs, n_model=nprocs)
    with open(out_path, "w") as f:
        json.dump(out, f)
    sys.stdout.flush()
    os._exit(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0,
                    help="coordinator port; 0 picks a free one at runtime")
    ap.add_argument("--role", default="parent")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.role == "child":
        run_child(args.pid, args.nprocs, args.port, args.out)
        return
    if args.role == "ref":
        run_ref(args.out, args.nprocs)
        return

    import tempfile

    if not args.port:
        # grab a free port and release it just before the children bind:
        # collision-safe against concurrent test runs on a shared host
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            args.port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env_ref = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count="
                                  + str(args.nprocs))
    with tempfile.TemporaryDirectory() as td:
        ref_path = os.path.join(td, "ref.json")
        mp_path = os.path.join(td, "mp.json")
        subprocess.run([sys.executable, __file__, "--role", "ref",
                        "--nprocs", str(args.nprocs),
                        "--out", ref_path], env=env_ref, check=True,
                       timeout=600, cwd=REPO)
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--role", "child", "--pid", str(i),
             "--nprocs", str(args.nprocs), "--port", str(args.port),
             "--out", mp_path], env=env, cwd=REPO)
            for i in range(args.nprocs)]
        for p in procs:
            rc = p.wait(timeout=600)
            assert rc == 0, f"child exited {rc}"
        ref = json.load(open(ref_path))
        mp = json.load(open(mp_path))

    report = {"nprocs": args.nprocs, "ref": ref, "multiprocess": mp}
    keys = ["dp_loss", "dp_param_sum", "slab_loss", "slab_param_sum"]
    if "crossed_loss" in ref:
        keys += ["crossed_loss", "crossed_param_sum"]
        assert "crossed_loss" in mp, "crossed step missing multi-process"
    for key in keys:
        a, b = ref[key], mp[key]
        rel = abs(a - b) / max(abs(a), 1e-8)
        assert rel < 1e-4, (key, a, b)
    report["ok"] = True
    print(json.dumps(report))


if __name__ == "__main__":
    main()
