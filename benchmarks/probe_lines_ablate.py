"""In-situ ablation of the line forward kernel at 256^3 (camera bundle).

Variants: full, nozsel (dots kept, z-select skipped), nogather (refresh
skipped entirely), freeze (no stepping — pure scheduler+refresh, windows run
to max_windows so is NOT time-comparable; use full-vs-nozsel and
full-vs-nogather deltas).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_lines_ablate.py
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

for k in (16, 32):
    for ab in ("", "zsel2", "dots2"):
        def run():
            out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                              step_scale=STEP, k_steps=k, table=table, nb=nb,
                              _ablate=ab)
            s = float(jnp.sum(out.end_iteration.astype(jnp.float32)))
            w = float(jnp.sum(out.windows_used.astype(jnp.float32)))
            return s, w
        s, w = run()
        t2 = time.perf_counter(); s, w = run(); t3 = time.perf_counter()
        print(f"k={k} ablate={ab or 'full':9s}: run {t3-t2:.4f}s windows {w:.0f} "
              f"us/window {1e6*(t3-t2)/max(w,1):.2f}", flush=True)
