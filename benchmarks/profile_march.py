"""Clean re-profiling of the march kernel on the real chip (median of N)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_pallas import march_pallas, build_brick_table
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST


def scene(grid=256):
    ax = np.linspace(-1, 1, grid, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))
    return build_packed_field(ior)


def rays(n_rays, grid):
    side = int(np.sqrt(n_rays))
    ys = np.linspace(3.0, grid - 4.0, side, dtype=np.float32)
    yy, zz = np.meshgrid(ys, ys, indexing="ij")
    pos = jnp.asarray(np.stack([np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
    dirs = jnp.asarray(np.tile(np.array([[16.0, 0.0, 0.0]], np.float32), (side * side, 1)))
    return pos, dirs


def median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out.end_position)
        _ = np.asarray(out.end_iteration[:4])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


def main():
    grid, n_rays, budget = 256, 128 * 1024, 512
    packed = scene(grid)
    table, nb = build_brick_table(packed, None)
    pos, dirs = rays(n_rays, grid)
    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        for k in (16, 32, 64):
            def fn():
                return march_pallas(
                    packed, pos, dirs, budget, bend_scale=bend, step_scale=step,
                    k_steps=k, table=table, nb=nb, precision=prec,
                )
            fn()  # compile
            dt, out = median_time(fn)
            w = np.asarray(out.windows_used)
            wsum = int(w.sum())
            steps = budget * n_rays
            print(
                f"prec={str(prec).split('.')[-1]:8s} k={k:3d}: {dt:.3f}s "
                f"{steps/dt/1e9:.3f} G steps/s | windows/tile {w.mean():.0f} "
                f"occ {steps/(wsum*k*1024):.1%} window-cost {dt/wsum*1e6:.1f} us"
            )


if __name__ == "__main__":
    main()
