"""Round-5 dual-brick-residency A/B (see march_lines dual docstring).

Interleaved min-of-5 of the 256^3 camera-bundle forward march:
  single — one resident brick per sublane (r4 production)
  dual   — two resident bricks per sublane, per-lane merge
each with and without the unrolled chunk loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_dual.py
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
    ("1c_k32_nomat", dict(dual=True, k_steps=32, anchor2x=False, _ablate="nomat")),
    ("1c_k32_mat", dict(dual=True, k_steps=32, anchor2x=False)),
    ("1c_k64_mat", dict(dual=True, k_steps=64, anchor2x=False)),
    ("2x_k64_mat", dict(dual=True, k_steps=64, anchor2x=True)),
]
REPS = 9


def run(kw):
    out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, table=table, nb=nb, **kw)
    return (float(jnp.sum(out.end_iteration.astype(jnp.float32))),
            float(jnp.sum(out.windows_used.astype(jnp.float32))))


ref = None
for name, kw in VARIANTS:
    t0 = time.perf_counter()
    s, w = run(kw)
    print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s "
          f"steps={s/1e6:.2f}M windows={w:.0f}", flush=True)
    if ref is None:
        ref = s
    assert abs(s - ref) < 1, (name, s, ref)

times = {name: [] for name, _ in VARIANTS}
wins = {}
for rep in range(REPS):
    for name, kw in VARIANTS:
        t0 = time.perf_counter()
        s, w = run(kw)
        times[name].append(time.perf_counter() - t0)
        wins[name] = (w, kw["k_steps"])
for name, _ in VARIANTS:
    ts = sorted(times[name])
    w, k = wins[name]
    slots = w * k * 1024
    print(f"{name}: min {ts[0]:.4f}s median {ts[len(ts)//2]:.4f}s -> "
          f"{ref/ts[0]/1e9:.4f} Gsteps/s  eff={ref/slots:.3f} "
          f"per_window={ts[0]/w*1e6:.2f}us (windows={w:.0f})", flush=True)
