"""Backward-kernel scatter cost/accuracy A/B at 256^3: hi/lo split (2 dots)
vs single bf16 pass (scat1).  Uses the floor-cancelling scan protocol:
4 chained backward calls inside one jit.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_bwd_scat.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import (
    _bwd_impl_lines, march_lines,
)
from volumeraytracer_tpu.kernels.line_table import build_line_table, fold_line_grads
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
ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

# one forward for the end state
res, raw = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                       step_scale=STEP, k_steps=32, table=table, nb=nb,
                       return_state=True)
nexec = jnp.maximum(jnp.int32(BUDGET - 1) - raw["remaining"], 0)
wp = jnp.ones_like(pos)
wd = jnp.zeros_like(dirs)

grads = {}
for ab in ("", "scat1"):
    def one(ab=ab):
        g, dp, dd, _, _ = _bwd_impl_lines(
            table, nb, res.end_position, res.end_direction, nexec, wp, wd,
            bend=(BEND,)*3, step=(STEP,)*3, k_steps=32, max_windows=None,
            interpret=False, budget=BUDGET, ablate=ab)
        return jnp.sum(g * g), g

    run = jax.jit(lambda: one()[0])
    _ = float(run())  # compile
    ts = []
    for _i in range(5):
        t2 = time.perf_counter(); _ = float(run()); t3 = time.perf_counter()
        ts.append(t3 - t2)
    t = float(np.median(ts))
    print(f"bwd ablate={ab or 'hi/lo':6s}: median {t:.4f}s/bwd "
          f"(spread {min(ts):.3f}-{max(ts):.3f}) "
          f"{N_RAYS*BUDGET/t/1e9:.4f} Gsteps/s", flush=True)
    g = jax.jit(lambda: one()[1])()
    grads[ab] = np.asarray(fold_line_grads(g, packed.shape, nb))

ref = grads[""]
alt = grads["scat1"]
scale = np.abs(ref).max()
print(f"scat1 grad relerr vs hi/lo: {np.abs(alt-ref).max()/scale:.3e}", flush=True)
