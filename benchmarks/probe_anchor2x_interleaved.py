"""Interleaved repeated timing of anchor2x vs baseline (cancels slow drift
in the axon relay).  Run: PYTHONPATH=/root/repo:/root/.axon_site python ..."""
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

VARIANTS = [("a2x_k32", True, 32), ("a2x_k64", True, 64)]

def run(a2x, k):
    out = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                      step_scale=STEP, k_steps=k, table=table, nb=nb,
                      anchor2x=a2x)
    return float(jnp.sum(out.end_iteration.astype(jnp.float32)))

for name, a2x, k in VARIANTS:
    run(a2x, k)  # compile
times = {name: [] for name, _, _ in VARIANTS}
for rep in range(5):
    for name, a2x, k in VARIANTS:
        t0 = time.perf_counter(); s = run(a2x, k); t1 = time.perf_counter()
        times[name].append(t1 - t0)
for name, _, _ in VARIANTS:
    ts = sorted(times[name])
    print(f"{name}: min {ts[0]:.4f}s median {ts[2]:.4f}s "
          f"-> {N_RAYS*BUDGET/ts[0]/1e9:.4f} Gsteps/s (min)", flush=True)
