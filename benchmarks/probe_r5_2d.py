"""Measured 2-D XLA-march throughput (the 2-D waiver's number, README).

2-D volumes run on the XLA march by design: a 2-D packed field fits VMEM
whole (1024² × 3ch ≈ 12 MB), so XLA's fused gather-march needs no brick
residency machinery.  This probe records the throughput backing that
waiver.  Measured 2026-08-21 on the v5e:

    2D XLA march 1024^2, 131072 rays x 512 budget: 1835 ms/march
    -> 0.037 Gsteps/s (fwd; coherent +x bundle, random y)

For scale: the reference's only 2-D implementations are the dim-templated
CPU kernel and the CuPy path (no published numbers); the 2-D fields that
fit VMEM whole make a brick-resident 2-D Pallas kernel a low-value
specialisation — the XLA number above is the documented trade.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_2d.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 1024, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y = np.meshgrid(ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y)).astype(np.float32))
packed = build_packed_field(ior)
rng = np.random.default_rng(0)
pos = jnp.asarray(np.stack(
    [np.full(N_RAYS, 1.5, np.float32),
     rng.uniform(3.0, GRID - 6.0, N_RAYS).astype(np.float32)], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0.0]], np.float32), (N_RAYS, 1)))

REPS = 4


@jax.jit
def run(p):
    def body(c, _):
        r = march_ops.march_float(
            p + c, None, pos, dirs, BUDGET, bend_scale=BEND, step_scale=STEP,
            chunk_steps=64,
        )
        return jnp.sum(r.end_position) * 0.0, jnp.sum(
            r.end_iteration.astype(jnp.float32)
        )
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


steps = float(jnp.sum(run(packed)) / REPS)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(run(packed)))
    ts.append((time.perf_counter() - t0) / REPS)
print(f"2D XLA march {GRID}^2, {N_RAYS} rays x {BUDGET} budget: "
      f"{min(ts)*1e3:.1f} ms/march -> {steps/min(ts)/1e9:.3f} Gsteps/s",
      flush=True)
