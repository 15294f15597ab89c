"""In-situ window-cost fit for the production forward kernel.

Runs the real 256^3 bench workload over a k_steps sweep, reads the kernel's
own ``windows_used`` output, and fits   t = W(k) * (F + k*d)   to attribute
per-window fixed cost F (scheduler + gather refresh) vs per-step-iteration
cost d (the k-loop body) as they actually run — the standalone component
probe (probe_window.py) underestimated in-situ costs by ~5x.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_insitu.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import (
    R, brick_grid, build_brick_table, march_pallas,
)
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 131072, 512


def main():
    assert jax.default_backend() in ("tpu", "axon")
    ax = np.linspace(-1, 1, GRID, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x * x + y * y + z * z)).astype(np.float32))
    side = int(np.sqrt(N_RAYS))
    ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
    yy, zz = np.meshgrid(ys, ys, indexing="ij")
    pos = jnp.asarray(np.stack(
        [np.full(side * side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))
    dirs = jnp.asarray(np.tile(np.array([[16., 0., 0.]], np.float32), (side * side, 1)))
    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    packed = build_packed_field(ior)
    table, nb = build_brick_table(packed, None)
    jax.block_until_ready(table)

    rows = []
    for k in (16, 32, 64, 128):
        def run():
            out = march_pallas(packed, pos, dirs, BUDGET, bend_scale=bend,
                               step_scale=step, k_steps=k, table=table, nb=nb)
            return (jnp.sum(out.end_iteration.astype(jnp.float64)),
                    jnp.sum(out.windows_used.astype(jnp.float64)))

        s, w = run()
        steps, wins = float(s), float(w)
        t0 = time.perf_counter()
        for _ in range(2):
            s, w = run()
            float(s); float(w)
        dt = (time.perf_counter() - t0) / 2
        eff = steps / (wins * k * R)
        print(f"k={k:4d}: t={dt:.4f}s windows={wins:9.0f} steps={steps/1e6:.1f}M "
              f"window_eff={eff:.3f} {steps/dt/1e9:.3f} Gsteps/s", flush=True)
        rows.append((k, dt, wins))

    # least-squares fit t = W*(F + k*d)
    A = np.array([[w, w * k] for k, _, w in rows])
    b = np.array([t for _, t, _ in rows])
    (F, d), *_ = np.linalg.lstsq(A, b, rcond=None)
    print(f"fit: per-window fixed F = {F*1e6:.2f} us, per-k-iteration d = {d*1e6:.3f} us")
    for (k, t, w), tp in zip(rows, A @ np.array([F, d])):
        print(f"  k={k:4d}: measured {t:.4f}s predicted {tp:.4f}s")


if __name__ == "__main__":
    main()
