"""Round-5 per-window fixed-cost measurement.

``_ablate='freeze'`` makes every ray non-evaluable: each window runs the
full scheduler + gather + one 8-step (dead) chunk and exits — so with a
pinned ``max_windows`` the run time divided by windows is the per-window
FIXED cost (everything except executed step slots).  A normal march in the
same run gives the full per-window cost; the difference is the step loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_fixed.py
"""
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

VARIANTS = [
    ("mw2", dict(k_steps=32, max_windows=2)),
    ("mw5", dict(k_steps=32, max_windows=5)),
    ("mw10", dict(k_steps=32, max_windows=10)),
    ("mw19_full", dict(k_steps=32)),
]
REPS = 7


def run(kw):
    out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, table=table, nb=nb, **kw)
    return (float(jnp.sum(out.end_iteration.astype(jnp.float32))),
            float(jnp.sum(out.windows_used.astype(jnp.float32))))


for name, kw in VARIANTS:
    run(kw)
times = {n: [] for n, _ in VARIANTS}
wins = {}
for rep in range(REPS):
    for name, kw in VARIANTS:
        t0 = time.perf_counter()
        s, w = run(kw)
        times[name].append(time.perf_counter() - t0)
        wins[name] = (s, w)
for name, _ in VARIANTS:
    ts = sorted(times[name])
    s, w = wins[name]
    print(f"{name}: min {ts[0]:.4f}s median {ts[len(ts)//2]:.4f}s "
          f"steps={s/1e6:.2f}M windows={w:.0f} "
          f"per_window={ts[0]/w*1e6:.2f}us", flush=True)
