"""Round-5 scattered-ray compaction tuning under the new defaults
(dual residency, 1-cell anchor, chunk-hoisted materialisation).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_scattered.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines_compact
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
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.uniform(4.0, GRID - 4.0, (N_RAYS, 3)).astype(np.float32))
d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
dirs = jnp.asarray(16.0 * d)

VARIANTS = [
    ("dual_k32_pw64", dict(k_steps=32, phase_windows=64)),
    ("nodual_k32_pw64", dict(k_steps=32, phase_windows=64, dual=False)),
    ("nodual_k16_pw64", dict(k_steps=16, phase_windows=64, dual=False)),
    ("dual_k16_pw96", dict(k_steps=16, phase_windows=96)),
]
REPS = 5


def run(kw):
    out = march_lines_compact(packed, pos, dirs, BUDGET, bend_scale=BEND,
                              step_scale=STEP, table=table, nb=nb, **kw)
    return float(jnp.sum(out.end_iteration.astype(jnp.float32)))


for name, kw in VARIANTS:
    run(kw)
times = {n: [] for n, _ in VARIANTS}
steps = {}
for rep in range(REPS):
    for name, kw in VARIANTS:
        t0 = time.perf_counter()
        s = run(kw)
        times[name].append(time.perf_counter() - t0)
        steps[name] = s
for name, _ in VARIANTS:
    ts = sorted(times[name])
    print(f"{name}: min {ts[0]:.4f}s median {ts[len(ts)//2]:.4f}s -> "
          f"{steps[name]/ts[0]/1e9:.4f} Gsteps/s", flush=True)
