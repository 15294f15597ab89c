"""Pin down the 256^3 forward run's ~44 ms constant + precision/k trades.

All timings pipelined (REPS dispatches issued, then synced) to amortize the
relay round-trip.

  E1 budget=8          -> the per-run constant (dispatch + plumbing + cold
                          brick loads), marching ~0
  E4 budget=8, 32K rays-> does the constant scale with tile count (128 -> 32)?
  E2 precision sweep   -> HIGH vs HIGHEST vs DEFAULT at b512 (accuracy trade)
  E3 k sweep           -> 16/32/64 at b512 DEFAULT

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_const.py
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
pos_all = np.stack([np.full(side * side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1)
dirs_all = np.tile(np.array([[16., 0., 0.]], np.float32), (side * side, 1))
inv = 2.0
bend = inv / float(FIX_ONE)
step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

packed = build_packed_field(ior)
table, nb = build_brick_table(packed, None)
jax.block_until_ready(table)

REPS = 4


def timed(name, budget, n, prec, k):
    pos = jnp.asarray(pos_all[:n])
    dirs = jnp.asarray(dirs_all[:n])

    def run():
        out = march_pallas(packed, pos, dirs, budget, bend_scale=bend,
                           step_scale=step, k_steps=k, table=table, nb=nb,
                           precision=prec)
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
          f"-> {steps/max(dt,1e-9)/1e9:.3f} Gsteps/s", flush=True)
    return dt


H = jax.lax.Precision.HIGHEST
HI = jax.lax.Precision.HIGH
D = jax.lax.Precision.DEFAULT

timed("E1 b8    128K D k32", 8, N_RAYS, D, 32)
timed("E4 b8     32K D k32", 8, 32768, D, 32)
timed("E4b b512  32K D k32", 512, 32768, D, 32)
try:
    timed("E2 b512 128K HIGH k32", 512, N_RAYS, HI, 32)
except Exception as e:
    print("HIGH unsupported:", type(e).__name__, str(e)[:120], flush=True)
timed("E3 b512 128K D k16", 512, N_RAYS, D, 16)
timed("E3 b512 128K D k64", 512, N_RAYS, D, 64)
timed("E3 b512 128K D k32", 512, N_RAYS, D, 32)
