"""Chip A/B of the 2-cell-x anchor slab vs the 1-cell anchor (fwd, 256^3
camera bundle).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_anchor2x.py
"""
import sys, time
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
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x*x + y*y + z*z)).astype(np.float32))
packed = build_packed_field(ior)
table, nb = build_line_table(packed, None)
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

ref_end = None
for a2x, k in ((False, 32), (True, 32), (True, 48), (True, 64)):
    def run():
        out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                          step_scale=STEP, k_steps=k, table=table, nb=nb,
                          anchor2x=a2x)
        s = float(jnp.sum(out.end_iteration.astype(jnp.float32)))
        w = float(jnp.sum(out.windows_used.astype(jnp.float32)))
        return s, w, out
    s, w, out = run()
    t2 = time.perf_counter(); s, w, out = run(); t3 = time.perf_counter()
    if ref_end is None:
        ref_end = np.asarray(out.end_position)
        perr = 0.0
    else:
        perr = float(np.abs(np.asarray(out.end_position) - ref_end).max())
    print(f"a2x={int(a2x)} k={k}: run {t3-t2:.4f}s {s/(t3-t2)/1e9:.4f} Gsteps/s "
          f"windows {w:.0f} eff {s/(w*k*1024):.4f} pos_vs_base {perr:.2e}",
          flush=True)
