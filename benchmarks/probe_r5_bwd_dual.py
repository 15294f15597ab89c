"""Round-5 backward dual-residency A/B (mirror of probe_r5_dual).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_bwd_dual.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines, _bwd_impl_lines
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

res = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND, step_scale=STEP,
                  k_steps=32, table=table, nb=nb, dual=True)
end_pos = jax.block_until_ready(res.end_position)
end_dir = jax.block_until_ready(res.end_direction)
nexec = jnp.asarray(res.end_iteration, jnp.int32) - 1
steps = float(jnp.sum(jnp.maximum(nexec, 0).astype(jnp.float32)))
dp = jnp.ones_like(end_pos)
dv = jnp.zeros_like(end_dir)

VARIANTS = [
    ("bwd_dual_k32_nomat", dict(dual=True, k_steps=32, ablate="nomat")),
    ("bwd_dual_k32_mat", dict(dual=True, k_steps=32)),
    ("bwd_dual_k16_mat", dict(dual=True, k_steps=16)),
]
REPS = 7


def run(kw):
    outs = _bwd_impl_lines(
        table, nb, end_pos, end_dir, nexec, dp, dv,
        bend=(BEND,) * 3, step=(STEP,) * 3, max_windows=None,
        interpret=False, budget=BUDGET, **kw)
    return (float(jnp.sum(outs[0])),
            float(jnp.sum(jnp.abs(outs[4].astype(jnp.float32)))))


gref = None
for name, kw in VARIANTS:
    t0 = time.perf_counter()
    g, w = run(kw)
    print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s gsum={g:.6e} "
          f"windows={w:.0f}", flush=True)
    if gref is None:
        gref = g
    else:
        assert abs(g - gref) < 1e-3 * abs(gref), (name, g, gref)

times = {name: [] for name, _ in VARIANTS}
wins = {}
for rep in range(REPS):
    for name, kw in VARIANTS:
        t0 = time.perf_counter()
        _, w = run(kw)
        times[name].append(time.perf_counter() - t0)
        wins[name] = (w, kw["k_steps"])
for name, _ in VARIANTS:
    ts = sorted(times[name])
    w, k = wins[name]
    print(f"{name}: min {ts[0]:.4f}s median {ts[len(ts)//2]:.4f}s -> "
          f"{steps/ts[0]/1e9:.4f} Gsteps/s  eff={steps/(w*k*1024):.3f} "
          f"per_window={ts[0]/w*1e6:.2f}us (windows={w:.0f})", flush=True)
