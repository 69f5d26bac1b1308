"""Isolate gather vs body math in the march while-loop.

Runs _march_core on the flagship-style 129^3 bf16 volume with (a) the real
fused corner gather, (b) a fake fetch returning constants (same shapes, no
memory traffic).  The delta is the gather's true in-situ cost; the fake run
is the VPU body cost (isosurface cubic + node/exit logic + state updates).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

rng = np.random.default_rng(0)


def timeit(f, *args, iters=5):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from vrt.march.march import (_march_core, _make_corner_fetch,
                                 _gather_accel)
    from vrt.march import isosurface as iso
    from vrt.march.types import DeviceVolume
    from vrt.volume.volume import VoxelVolume
    from vrt.volume.sdf import Sphere

    vol = VoxelVolume.from_generator(Sphere(radius=62.0), 7, 100.0)
    dv = DeviceVolume.from_volume(vol, accel_mode="chebyshev",
                                  march_dtype=jnp.bfloat16)

    R = 1 << 20
    ro = rng.normal(size=(R, 3))
    ro = ro / np.linalg.norm(ro, axis=-1, keepdims=True) * 300.0
    rd = -ro + rng.normal(scale=30.0, size=ro.shape)
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.asarray(ro, jnp.float32)
    rd = jnp.asarray(rd, jnp.float32)
    tm = jnp.full(R, 1e4, jnp.float32)

    fetch = iso.make_fetch(dv.sdf, dv.n)
    accel_fetch = lambda cell: _gather_accel(dv.accel, dv.n - 1, cell)

    real_cfetch = _make_corner_fetch(dv, fetch)

    # fake fetch: value pattern that keeps rays marching (positive densities
    # = no surface anywhere; accel=1 -> leaf nodes with surface flag off...
    # use av=2 (skip distance 1, no surface) so the node walk continues)
    def fake_cfetch(cell):
        s = (cell[..., 0] + cell[..., 1] + cell[..., 2]).astype(jnp.float32)
        v8 = 1.0 + jnp.stack([s * 0.001 + k for k in range(8)], -1)
        av = jnp.full(cell.shape[:-1], 2, jnp.int32)
        return v8, av

    def fake_accel(cell):
        return jnp.full(cell.shape[:-1], 2, jnp.int32)

    for name, cf, af in [("real", real_cfetch, accel_fetch),
                         ("fake (no gather)", fake_cfetch, fake_accel)]:
        f = jax.jit(lambda o, d, t, cf=cf, af=af: _march_core(
            cf, fetch, af, dv.n, dv.cell_size, dv.extends, "chebyshev",
            o, d, t, True, False))
        hit = f(ro, rd, tm)
        steps = np.asarray(hit.steps)
        it = int(steps.max())
        dt = timeit(f, ro, rd, tm)
        print(f"{name:18s}: {dt*1e3:8.1f} ms, {it} lockstep iters, "
              f"{dt/it*1e6:8.1f} us/iter @1M lanes "
              f"({R*it/dt/1e6:.0f} M lane-steps/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
