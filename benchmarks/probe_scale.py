"""Marginal-vs-constant decomposition of the 256^3 forward run.

Pipelines dispatches (all reps issued before syncing) to amortize the ~50 ms
relay round-trip, then contrasts:

  A. budget 512,  sorted     (the bench config)
  B. budget 512,  unsorted   (A - B = argsort + permutation-gather cost)
  C. budget 2048, unsorted   (C - B)/3 = true marginal cost of 512 steps'
                              worth of windows+steps — no constant, no noise

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_scale.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import build_brick_table, march_pallas
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS = 256, 131072

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

REPS = 4


def timed(name, budget, sort):
    def run():
        out = march_pallas(packed, pos, dirs, budget, bend_scale=bend,
                           step_scale=step, k_steps=32, table=table, nb=nb,
                           precision=jax.lax.Precision.DEFAULT,
                           sort_rays=sort)
        return (jnp.sum(out.end_iteration.astype(jnp.float64)),
                jnp.sum(out.windows_used.astype(jnp.float64)))

    s, w = run()
    steps, wins = float(s), float(w)
    t0 = time.perf_counter()
    outs = [run() for _ in range(REPS)]
    for s, w in outs:
        float(s); float(w)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: t={dt:.4f}s windows={wins:.0f} steps={steps/1e6:.1f}M "
          f"-> {steps/dt/1e9:.3f} Gsteps/s", flush=True)
    return dt, wins, steps


tA = timed("A b512  sorted  ", 512, True)
tB = timed("B b512  unsorted", 512, False)
tC = timed("C b2048 unsorted", 2048, False)

marg = (tC[0] - tB[0]) / (tC[2] - tB[2])
wmarg = (tC[0] - tB[0]) / (tC[1] - tB[1])
print(f"sort+perm cost: {(tA[0]-tB[0])*1e3:.1f} ms")
print(f"marginal: {marg*1e9:.3f} ns/step, {wmarg*1e6:.2f} us/window")
print(f"constant (B - marginal*steps): {(tB[0]-marg*tB[2])*1e3:.1f} ms")
