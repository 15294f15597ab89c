"""Interleaved bwd-only timing: anchor2x vs 1-cell anchor (+ scat1 rider).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_bwd_2x.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import march_lines, _bwd_impl_lines
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
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

res, raw = march_lines(packed, pos, dirs, BUDGET, bend_scale=BEND,
                       step_scale=STEP, k_steps=32, table=table, nb=nb,
                       return_state=True)
nexec = jnp.maximum(jnp.int32(BUDGET - 1) - raw["remaining"], 0)
ep = jax.device_put(res.end_position)
ed = jax.device_put(res.end_direction)
wp = jnp.ones_like(pos)
wd = jnp.zeros_like(dirs)

def make(a2x, ab=""):
    @jax.jit
    def f(table, ep, ed, nexec, wp, wd):
        g, dp, dd, _, _ = _bwd_impl_lines(
            table, nb, ep, ed, nexec, wp, wd,
            bend=(BEND,)*3, step=(STEP,)*3, k_steps=32, max_windows=None,
            interpret=False, budget=BUDGET, anchor2x=a2x, ablate=ab)
        return jnp.sum(g * g) + jnp.sum(dp * dp)
    return lambda: f(table, ep, ed, nexec, wp, wd)

CFG = [("bwd_1cell", make(False)), ("bwd_1cell_scat1", make(False, "scat1"))]
vals = {}
for name, fn in CFG:
    vals[name] = float(fn())  # compile
times = {n: [] for n, _ in CFG}
for rep in range(5):
    for name, fn in CFG:
        t0 = time.perf_counter(); _ = float(fn()); t1 = time.perf_counter()
        times[name].append(t1 - t0)
for name, _ in CFG:
    ts = sorted(times[name])
    print(f"{name}: min {ts[0]:.4f}s median {ts[2]:.4f}s "
          f"-> {N_RAYS*BUDGET/ts[0]/1e9:.4f} Gsteps/s (min)  val {vals[name]:.6e}",
          flush=True)


# gradient accuracy of the single-pass scatter vs the hi/lo reference
@jax.jit
def gfold(table, ep, ed, nexec, wp, wd, ab):
    pass  # placeholder (not used)

def grad_of(ab):
    @jax.jit
    def f(table, ep, ed, nexec, wp, wd):
        g, dp, dd, _, _ = _bwd_impl_lines(
            table, nb, ep, ed, nexec, wp, wd,
            bend=(BEND,)*3, step=(STEP,)*3, k_steps=32, max_windows=None,
            interpret=False, budget=BUDGET, anchor2x=False, ablate=ab)
        return fold_line_grads(g, packed.shape, nb)
    out = f(table, ep, ed, nexec, wp, wd)
    # reduce on device: full fetch would time the tunnel
    return out

gref = grad_of("")
galt = grad_of("scat1")
num = float(jnp.max(jnp.abs(galt - gref)))
den = float(jnp.max(jnp.abs(gref)))
print(f"scat1 grad maxerr/scale: {num/den:.3e}  (scale {den:.3e})", flush=True)
