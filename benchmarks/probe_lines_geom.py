"""Chip A/B of the line-brick geometry: fused k32 + standalone fwd k16/k32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_lines_geom.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff
from volumeraytracer_tpu.kernels.march_lines import march_lines
from volumeraytracer_tpu.kernels.line_table import LBX, LBY, LBZ, build_line_table
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
print(f"geometry: {LBX}x{LBY}x{LBZ}", flush=True)

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x*x + y*y + z*z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

# small-scene parity on chip first
n = 48
axs = np.linspace(-1, 1, n, dtype=np.float32)
xs, ys2, zs = np.meshgrid(axs, axs, axs, indexing="ij")
ior_s = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (xs*xs + ys2*ys2 + zs*zs)).astype(np.float32))
packed_s = build_packed_field(ior_s)
side_s = 32
ys_s = np.linspace(3.0, n - 4.0, side_s, dtype=np.float32)
yy_s, zz_s = np.meshgrid(ys_s, ys_s, indexing="ij")
pos_s = jnp.asarray(np.stack([np.full(side_s*side_s, 1.5, np.float32), yy_s.ravel(), zz_s.ravel()], -1))
dirs_s = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side_s*side_s, 1)))
t0 = time.perf_counter()
res = march_lines(packed_s, pos_s, dirs_s, BUDGET, bend_scale=BEND, step_scale=STEP)
jax.block_until_ready(res.end_position)
t1 = time.perf_counter()
ref = march_ops.march_float(packed_s, None, pos_s, dirs_s, BUDGET,
                            bend_scale=BEND, step_scale=STEP, chunk_steps=64)
pe = float(jnp.abs(res.end_position - ref.end_position).max())
ie = int(jnp.abs(res.end_iteration.astype(jnp.int64) - ref.end_iteration.astype(jnp.int64)).max())
print(f"small parity: compile {t1-t0:.1f}s pos_err {pe:.2e} iter_err {ie}", flush=True)
assert pe < 1e-3 and ie == 0

packed_b = build_packed_field(ior)
table, nb = build_line_table(packed_b, None)

for k in (16, 32):
    def run():
        out = march_lines(packed_b, pos, dirs, BUDGET, bend_scale=BEND,
                          step_scale=STEP, k_steps=k, table=table, nb=nb)
        s = float(jnp.sum(out.end_iteration.astype(jnp.float64)))
        w = float(jnp.sum(out.windows_used.astype(jnp.float64)))
        return s, w
    s, w = run()
    t2 = time.perf_counter(); s, w = run(); t3 = time.perf_counter()
    print(f"fwd k={k}: run {t3-t2:.4f}s {s/(t3-t2)/1e9:.4f} Gsteps/s "
          f"window_eff {s/(w*k*1024):.4f}", flush=True)

def loss(f, p, d):
    pk = build_packed_field(f)
    r = march_pallas_diff(pk, p, d, BUDGET, bend_scale=BEND, step_scale=STEP,
                          k_steps=32, layout="lines")
    return jnp.sum(r.end_position[:, 1])

@jax.jit
def fb(f, p, d):
    l, g = jax.value_and_grad(loss)(f, p, d)
    return l, jnp.sum(g * g)

t0 = time.perf_counter()
out = fb(ior, pos, dirs); _ = float(out[0]); _ = float(out[1])
t1 = time.perf_counter()
t2 = time.perf_counter()
out = fb(ior, pos, dirs); _ = float(out[0]); _ = float(out[1])
t3 = time.perf_counter()
print(f"fused k=32: compile {t1-t0:.1f}s run {t3-t2:.4f}s "
      f"{N_RAYS*BUDGET/(t3-t2)/1e9:.4f} Gsteps/s", flush=True)
