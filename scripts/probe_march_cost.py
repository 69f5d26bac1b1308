"""Where does a march while-loop iteration's time go?

Measures (a) gather-inside-fori_loop throughput vs batch size and table
size, (b) march_volume in situ on the flagship 129^3 volume at several
chunk sizes, with lockstep-iteration accounting, (c) the while-body's
non-gather math in isolation (same loop, corner fetch replaced by a
constant).  Decides: chunk size, compaction, and whether the body math is
worth a fused Pallas step.
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


def gather_in_loop():
    """bf16[T,9] gather inside a 64-iteration fori_loop (march-like)."""
    for t_rows in (64 ** 3, 128 ** 3):
        tbl = jnp.asarray(rng.random((t_rows, 9), np.float32), jnp.bfloat16)
        for r in (1 << 14, 1 << 16, 1 << 18, 1 << 20):
            idx = jnp.asarray(rng.integers(0, t_rows, r), jnp.int32)
            n_it = 64

            @jax.jit
            def f(t, i0):
                def body(k, carry):
                    i, acc = carry
                    v = t[i]
                    acc = acc + v[:, 0].astype(jnp.float32)
                    # index depends on gathered value: serializes like the
                    # real march (next cell depends on this step)
                    i = (i + v[:, 1].astype(jnp.int32) + k + 1) % t_rows
                    return (i, acc)
                _, acc = jax.lax.fori_loop(
                    0, n_it, body, (i0, jnp.zeros(i0.shape, jnp.float32)))
                return acc

            dt = timeit(f, tbl, idx)
            rows = r * n_it
            print(f"in-loop gather bf16[{t_rows},9] x{r:>8}: "
                  f"{dt*1e3:8.2f} ms  {rows/dt/1e6:7.1f} M rows/s "
                  f"({dt/n_it*1e6:7.1f} us/iter)", flush=True)


def march_in_situ():
    from vrt.march.march import march_volume
    from vrt.march.types import DeviceVolume
    from vrt.volume.volume import VoxelVolume
    from vrt.volume.sdf import Sphere, Box, CSG

    ext = 100.0
    csg = CSG(shape=Sphere(radius=0.62 * ext))
    csg.add_child(Box(extends=(0.75 * ext, 0.3 * ext, 0.3 * ext),
                      position=np.array([0., 0., 0.45 * ext], np.float32)),
                  1)
    vol = VoxelVolume.from_generator(csg, 7, ext)
    dv = DeviceVolume.from_volume(vol, accel_mode="chebyshev",
                                  march_dtype=jnp.bfloat16)

    ro = rng.normal(size=(1 << 20, 3))
    ro = ro / np.linalg.norm(ro, axis=-1, keepdims=True) * 300.0
    rd = -ro + rng.normal(scale=30.0, size=ro.shape)
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.asarray(ro, jnp.float32)
    rd = jnp.asarray(rd, jnp.float32)

    for chunk in (1 << 14, 1 << 16, 1 << 18, 1 << 20):
        oc = ro.reshape(-1, chunk, 3)
        dc = rd.reshape(-1, chunk, 3)
        tc = jnp.full(oc.shape[:2], 1e4, jnp.float32)

        @jax.jit
        def f(oc, dc, tc):
            return jax.lax.map(
                lambda x: march_volume(dv, *x), (oc, dc, tc))

        hit = f(oc, dc, tc)
        steps = np.asarray(hit.steps)
        lockstep = int((steps.max(axis=1) * chunk).sum())
        active = int(steps.sum())
        dt = timeit(f, oc, dc, tc)
        print(f"march 129^3 bf16 chunk {chunk:>8}: {dt*1e3:8.1f} ms  "
              f"{(1 << 20)/dt/1e6:5.2f} M rays/s  lockstep rows "
              f"{lockstep/1e6:6.1f} M ({lockstep/dt/1e6:7.1f} M rows/s, "
              f"waste {lockstep/max(active, 1):.2f}x)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    gather_in_loop()
    march_in_situ()
