"""Round-5 tile-width probe: RS sublane rows per ray tile (VRT_RS env).

The forward step body is a latency-bound dependency chain of ~70 small
vector ops; at RS=8 each op is a single (8,128) vreg op and the chain's
latency is paid per 1024 rays.  Wider tiles (RS=16/32) make every step-body
op 2/4 independent vreg ops — ILP the VPU can overlap — while keeping the
per-sublane brick scheduler unchanged (each sublane row still walks its own
resident brick).

Runs ONE RS value per process (kernel constants bind at import); the
wrapper shell loop compares.

Run:
  for rs in 8 16 32; do VRT_RS=$rs PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/probe_r5_rs.py; done
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines
from volumeraytracer_tpu.kernels.line_table import build_line_table
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
RS = int(os.environ.get("VRT_RS", "8"))

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))
packed = build_packed_field(ior)
table, nb = build_line_table(packed, None)
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack(
    [np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side * side, 1)))

K = 32


def run_fwd(ablate):
    out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, k_steps=K, table=table, nb=nb,
                      _ablate=ablate)
    return (float(jnp.sum(out.end_iteration.astype(jnp.float32))),
            float(jnp.sum(out.windows_used.astype(jnp.float32))))


for ab in ("",):
    t0 = time.perf_counter()
    s, w = run_fwd(ab)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, w = run_fwd(ab)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(f"RS={RS} ablate={ab!r}: compile {compile_s:.1f}s  min {ts[0]:.4f}s "
          f"median {ts[2]:.4f}s -> {s/ts[0]/1e9:.4f} Gsteps/s  "
          f"steps={s/1e6:.2f}M windows={w:.0f} "
          f"per_window={ts[0]/w*1e6:.2f}us", flush=True)
