"""Marginal cost of the |v|=n-init (n0) gather + its vjp scatter in the
fused 256^3 train step (perf_notes item 3).

A: full endpoint_render fused step (n0 differentiable)
B: same with stop_gradient(n0)  -> delta = n0 vjp (scatter) cost
C: n0 = 1.0 constant            -> delta vs B = n0 gather (fwd) cost

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_n0.py
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache
enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.ops.interp import interp_linear
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x*x + y*y + z*z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos0 = jnp.asarray(np.stack([np.full(side*side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))
dirs0 = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (side*side, 1)))

def make(n0_mode):
    def loss(f, p, d):
        pk = build_packed_field(f)
        pp = p - 0.5
        if n0_mode == "full":
            n0 = interp_linear(f, pp)
        elif n0_mode == "stopgrad":
            n0 = jax.lax.stop_gradient(interp_linear(f, pp))
        else:
            n0 = jnp.ones(p.shape[:1], jnp.float32)
        dd = d * n0[..., None]
        pp = pp - 0.5
        r = march_pallas_diff(pk, pp, dd, BUDGET, bend_scale=BEND,
                              step_scale=STEP, k_steps=32, layout="lines")
        return jnp.sum(r.end_position[:, 1])
    @jax.jit
    def fb(f, p, d):
        l, g = jax.value_and_grad(loss)(f, p, d)
        return l, jnp.sum(g * g)
    return fb

for mode in ("full", "stopgrad", "const"):
    fb = make(mode)
    out = fb(ior, pos0, dirs0); _ = float(out[0]); _ = float(out[1])
    t2 = time.perf_counter()
    out = fb(ior, pos0, dirs0); _ = float(out[0]); _ = float(out[1])
    t3 = time.perf_counter()
    print(f"n0={mode:9s}: run {t3-t2:.4f}s {N_RAYS*BUDGET/(t3-t2)/1e9:.4f} Gsteps/s", flush=True)
