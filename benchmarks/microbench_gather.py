"""Microbenchmark of march-step gather formulations on the real TPU.

The per-step trilinear interpolation (8 corner reads of a 4-channel field,
SURVEY.md §7 "gather-heavy trilinear interpolation") is the roofline
bottleneck.  This script measures, on the attached chip:

  A. the baseline march step: 8 row-gathers from a (V, 4) field
  B. corner-duplicated field: 1 row-gather from a (V, 32) field
     (all 8 corners pre-interleaved — the TPU analogue of the reference's
     contiguous z/z+1 tuple loads, cuda_volume_raytracer.cu:136-143)
  C. z-duplicated field: 4 row-gathers from a (V, 8) field
  D. full float march throughput at 128³/256³ (ray-steps/s)

Run:  PYTHONPATH=.:/root/.axon_site python benchmarks/microbench_gather.py
"""

import time
import numpy as np

import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion with a host transfer: on the axon relay platform
    block_until_ready returns before the computation actually finishes."""
    np.asarray(jax.tree.leaves(out)[0])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_gathers(grid=128, n_rays=65536, steps=64):
    V = grid**3
    key = jax.random.PRNGKey(0)
    f4 = jax.random.normal(key, (V, 4), jnp.float32)
    f8 = jax.random.normal(key, (V, 8), jnp.float32)
    f32c = jax.random.normal(key, (V, 32), jnp.float32)
    strides = jnp.asarray([grid * grid, grid, 1], jnp.int32)

    pos0 = jax.random.uniform(key, (n_rays, 3), jnp.float32, 1.0, grid - 3.0)

    def step_common(pos):
        base = jnp.floor(pos)
        frac = pos - base
        flat = jnp.sum(base.astype(jnp.int32) * strides, axis=-1)
        return base, frac, flat

    @jax.jit
    def march_a(pos, f4):
        def body(i, pos):
            base, frac, flat = step_common(pos)
            offs = jnp.asarray(
                [0, 1, grid, grid + 1, grid * grid, grid * grid + 1,
                 grid * grid + grid, grid * grid + grid + 1], jnp.int32)
            corners = jnp.take(f4, flat[:, None] + offs, axis=0)  # (N,8,4)
            wx, wy, wz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
            w = jnp.stack([
                (1-wx)*(1-wy)*(1-wz), (1-wx)*(1-wy)*wz, (1-wx)*wy*(1-wz), (1-wx)*wy*wz,
                wx*(1-wy)*(1-wz), wx*(1-wy)*wz, wx*wy*(1-wz), wx*wy*wz,
            ], axis=1)[..., 0]  # (N,8)
            interp = jnp.sum(corners * w[..., None], axis=1)  # (N,4)
            return jnp.clip(pos + interp[:, :3] * 1e-6 + 0.013, 1.0, grid - 3.0)
        return jax.lax.fori_loop(0, steps, body, pos)

    @jax.jit
    def march_b(pos, f32c):
        def body(i, pos):
            base, frac, flat = step_common(pos)
            row = jnp.take(f32c, flat, axis=0)  # (N,32)
            corners = row.reshape(-1, 8, 4)
            wx, wy, wz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
            w = jnp.stack([
                (1-wx)*(1-wy)*(1-wz), (1-wx)*(1-wy)*wz, (1-wx)*wy*(1-wz), (1-wx)*wy*wz,
                wx*(1-wy)*(1-wz), wx*(1-wy)*wz, wx*wy*(1-wz), wx*wy*wz,
            ], axis=1)[..., 0]
            interp = jnp.sum(corners * w[..., None], axis=1)
            return jnp.clip(pos + interp[:, :3] * 1e-6 + 0.013, 1.0, grid - 3.0)
        return jax.lax.fori_loop(0, steps, body, pos)

    @jax.jit
    def march_c(pos, f8):
        def body(i, pos):
            base, frac, flat = step_common(pos)
            offs = jnp.asarray([0, 1, grid, grid + 1], jnp.int32) * 1
            offs = jnp.asarray([0, grid, grid * grid, grid * grid + grid], jnp.int32)
            rows = jnp.take(f8, flat[:, None] + offs, axis=0)  # (N,4,8)
            corners = rows.reshape(-1, 8, 4)
            wx, wy, wz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
            w = jnp.stack([
                (1-wx)*(1-wy)*(1-wz), (1-wx)*(1-wy)*wz, (1-wx)*wy*(1-wz), (1-wx)*wy*wz,
                wx*(1-wy)*(1-wz), wx*(1-wy)*wz, wx*wy*(1-wz), wx*wy*wz,
            ], axis=1)[..., 0]
            interp = jnp.sum(corners * w[..., None], axis=1)
            return jnp.clip(pos + interp[:, :3] * 1e-6 + 0.013, 1.0, grid - 3.0)
        return jax.lax.fori_loop(0, steps, body, pos)

    results = {}
    for name, fn, tbl in [("A_8x4", march_a, f4), ("B_1x32", march_b, f32c), ("C_4x8", march_c, f8)]:
        dt = timeit(fn, pos0, tbl, iters=10)
        rs = n_rays * steps / dt
        results[name] = rs
        print(f"{name}: {dt*1e3:8.2f} ms  {rs/1e6:8.1f} Mray-steps/s")
    return results


if __name__ == "__main__":
    print("devices:", jax.devices())
    for grid in (64, 128, 256):
        print(f"--- grid {grid}³ ---")
        bench_gathers(grid=grid)
