"""Round-2 probes: gather size limits + XLA gather rate + march phase cost."""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)


def bench(f, *args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def try_case(name, fn):
    try:
        dt = fn()
        print(f"PASS {name}: {dt*1e6:.1f} us", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def equal_gather_axis0(s_rows, iters=100):
    """src [s_rows,128] f32, idx [s_rows,128]: out[i,j]=src[idx[i,j],j]."""
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((s_rows, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, s_rows, (s_rows, 128)), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((s_rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    dt = bench(f, src, idx, iters=iters)
    n = s_rows * 128
    print(f"  axis0 [{s_rows},128]: {dt*1e6:.1f} us = "
          f"{n/dt/1e9:.2f} G gathered f32/s", flush=True)
    return dt


def equal_gather_axis1(cols, iters=100):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((8, cols), np.float32))
    idx = jnp.asarray(rng.integers(0, cols, (8, cols)), jnp.int32)

    def k(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    f = jax.jit(lambda s, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, i))
    dt = bench(f, src, idx, iters=iters)
    print(f"  axis1 [8,{cols}]: {dt*1e6:.1f} us", flush=True)
    return dt


def xla_gather(rows=128 ** 3, r=1 << 20, width=9):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((rows, width), np.float32))
    idx = jnp.asarray(rng.integers(0, rows, r), jnp.int32)

    @jax.jit
    def f(s, i):
        return jnp.sum(s[i], axis=0)

    dt = bench(f, src, idx, iters=20)
    gbps = r * width * 4 / dt / 1e9
    print(f"  XLA row-gather [{r} x {width}f32 of {rows}]: {dt*1e3:.2f} ms"
          f" = {gbps:.1f} GB/s eff", flush=True)
    return dt


def xla_gather_flat(rows=128 ** 3 * 9, r=1 << 20):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((rows,), np.float32))
    idx = jnp.asarray(rng.integers(0, rows, r), jnp.int32)

    @jax.jit
    def f(s, i):
        return jnp.sum(jnp.take(s, i))

    dt = bench(f, src, idx, iters=20)
    print(f"  XLA flat-gather [{r} x 1f32 of {rows}]: {dt*1e3:.2f} ms = "
          f"{r*4/dt/1e9:.1f} GB/s eff", flush=True)
    return dt


def march_micro():
    """march_volume on a 65^3 sphere, 2^20 rays, on device."""
    from vrt.volume.sdf import Sphere
    from vrt.volume.volume import VoxelVolume
    from vrt.march.types import DeviceVolume
    from vrt.march.march import march_volume

    vol = VoxelVolume.from_generator(Sphere(radius=70.0), resolution=6,
                                     extends=100.0)
    dv = DeviceVolume.from_volume(vol)
    r = 1 << 20
    rng = np.random.default_rng(1)
    # rays from a shell aimed at the volume
    o = rng.normal(size=(r, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 300.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = d + rng.normal(scale=0.3, size=(r, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    t_max = jnp.full(r, 1e4, jnp.float32)

    f = jax.jit(lambda o, d, t: march_volume(dv, o, d, t))
    dt = bench(f, o, d, t_max, iters=5)
    print(f"  march_volume 65^3, 2^20 rays: {dt*1e3:.1f} ms = "
          f"{r/dt/1e6:.2f}M rays/s", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["sizes", "xla", "march"]
    if "sizes" in which:
        for s in (8, 64, 512, 2048, 8192):
            try_case(f"axis0-{s}", lambda s=s: equal_gather_axis0(s))
        for c in (128, 512, 2048):
            try_case(f"axis1-{c}", lambda c=c: equal_gather_axis1(c))
    if "xla" in which:
        try_case("xla-row9", lambda: xla_gather())
        try_case("xla-flat", lambda: xla_gather_flat())
        try_case("xla-row9-bf16", lambda: xla_gather(width=16))
    if "march" in which:
        try_case("march", march_micro)
