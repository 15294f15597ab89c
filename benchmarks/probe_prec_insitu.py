"""A/B the real 256^3 forward kernel: gather precision HIGHEST vs DEFAULT.

Isolates the MXU pass count of the one-hot gather dots in-situ (the
microbench is drowned by ~48 ms relay dispatch noise).  DEFAULT is lossy
(bf16 single pass) — timing only.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_prec_insitu.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import build_brick_table, march_pallas, R
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 131072, 512

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

for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)):
    def run():
        out = march_pallas(packed, pos, dirs, BUDGET, bend_scale=bend,
                           step_scale=step, k_steps=32, table=table, nb=nb,
                           precision=prec)
        return (jnp.sum(out.end_iteration.astype(jnp.float64)),
                jnp.sum(out.windows_used.astype(jnp.float64)))

    s, w = run()
    float(s); float(w)
    t0 = time.perf_counter()
    for _ in range(2):
        s, w = run()
        steps, wins = float(s), float(w)
    dt = (time.perf_counter() - t0) / 2
    print(f"{name}: t={dt:.4f}s windows={wins:.0f} per_window={dt/wins*1e6:.2f}us "
          f"{steps/dt/1e9:.3f} Gsteps/s", flush=True)
