"""A/B the fused line-layout train step over k_steps (and layouts).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_lines_k.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x*x + y*y + z*z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

def make(k, layout):
    def loss(f, p, d):
        pk = build_packed_field(f)
        r = march_pallas_diff(pk, p, d, BUDGET, bend_scale=BEND, step_scale=STEP,
                              k_steps=k, layout=layout)
        return jnp.sum(r.end_position[:, 1])
    @jax.jit
    def fb(f, p, d):
        l, g = jax.value_and_grad(loss)(f, p, d)
        return l, jnp.sum(g * g)
    return fb

for layout, k in [("lines", 16), ("lines", 32), ("lines", 8)]:
    fb = make(k, layout)
    t0 = time.perf_counter()
    out = fb(ior, pos, dirs); _ = float(out[0]); _ = float(out[1])
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    out = fb(ior, pos, dirs); _ = float(out[0]); _ = float(out[1])
    t3 = time.perf_counter()
    print(f"{layout} k={k}: compile {t1-t0:.1f}s run {t3-t2:.4f}s "
          f"{N_RAYS*BUDGET/(t3-t2)/1e9:.4f} Gsteps/s", flush=True)
