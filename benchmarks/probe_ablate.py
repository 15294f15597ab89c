"""Frozen-ray ablation: exact in-situ per-window cost attribution.

Freezes all rays (ok=False every step) so the window loop runs exactly
max_windows times with NO brick arrivals after the first window — isolating
the steady-state per-window cost, split by ablation:

  freeze            = full window (scalar block + onehot + 8 dots + stack +
                      k-step loop + while machinery), no DMA/rolls
  freeze,nogather   = same minus onehot/dots/stack

Compared against the real run's per-window cost (27.2 us at DEFAULT), the
difference real - freeze ≈ amortized DMA/roll arrival cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_ablate.py
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

GRID, N_RAYS = 64, 1024  # one tile
W = 4000

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x * x + y * y + z * z)).astype(np.float32))
side = 32
ys = np.linspace(4.0, GRID - 4.0, side, dtype=np.float32)
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

prec = jax.lax.Precision.DEFAULT
for name, abl, w in (("freeze", "freeze", W), ("freeze2x", "freeze", 2 * W),
                     ("nogather", "freeze,nogather", W),
                     ("nogather2x", "freeze,nogather", 2 * W)):
    def run(w=w, abl=abl):
        out = march_pallas(packed, pos, dirs, 10**6, bend_scale=bend,
                           step_scale=step, k_steps=32, table=table, nb=nb,
                           precision=prec, max_windows=w, _ablate=abl)
        return jnp.sum(out.windows_used.astype(jnp.float64))

    wins = float(run())
    t0 = time.perf_counter()
    for _ in range(2):
        wins = float(run())
    dt = (time.perf_counter() - t0) / 2
    print(f"{name}: t={dt:.4f}s windows={wins:.0f} per_window={dt/wins*1e6:.2f}us",
          flush=True)
