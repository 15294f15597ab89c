"""Scattered-ray two-phase compaction A/B at 256^3 (perf_notes 'why unsorted
rays are 4x less efficient'; SURVEY.md §7 two-phase mitigation).

A: march_lines, one-time initial sort only (the r3 baseline behaviour)
B: march_lines_compact with various phase_windows

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_two_phase.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines, march_lines_compact
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

# scattered workload: random positions all over the volume, random directions
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.uniform(4.0, GRID - 5.0, (N_RAYS, 3)).astype(np.float32))
d = rng.normal(0.0, 1.0, (N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
dirs = jnp.asarray(16.0 * d)

MW = 40_000

def timeit(fn):
    out = fn()
    s = float(jnp.sum(out.end_iteration.astype(jnp.float32)))
    t2 = time.perf_counter()
    out = fn()
    s = float(jnp.sum(out.end_iteration.astype(jnp.float32)))
    t3 = time.perf_counter()
    w = float(jnp.sum(out.windows_used.astype(jnp.float32)))
    return t3 - t2, s, w

t, s, w = timeit(lambda: march_lines(
    packed, pos, dirs, BUDGET, bend_scale=BEND, step_scale=STEP, k_steps=16,
    table=table, nb=nb, max_windows=MW))
print(f"single (sorted-once): run {t:.4f}s {s/t/1e9:.4f} Gsteps/s "
      f"eff {s/(w*16*1024):.4f}", flush=True)

for pw in (256, 64, 16):
    t, s, w = timeit(lambda: march_lines_compact(
        packed, pos, dirs, BUDGET, bend_scale=BEND, step_scale=STEP,
        k_steps=16, phase_windows=pw, table=table, nb=nb))
    print(f"compact pw={pw:4d}: run {t:.4f}s {s/t/1e9:.4f} Gsteps/s "
          f"windows {w:.0f}", flush=True)
