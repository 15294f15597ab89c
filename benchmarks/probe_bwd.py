"""Backward-kernel cost decomposition at 256^3 (pipelined timing).

Runs the reverse-replay adjoint standalone over a k sweep and with the
fold/pack stages separated, mirroring probe_insitu for the forward.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_bwd.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import (
    brick_grid, build_brick_table, march_pallas,
)
from volumeraytracer_tpu.kernels.march_bwd import _bwd_impl, fold_brickmajor_grads
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 131072, 512
REPS = 4

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x * x + y * y + z * z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack(
    [np.full(side * side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16., 0., 0.]], np.float32), (side * side, 1)))
inv = 2.0
bend = inv / float(FIX_ONE)
step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

packed = build_packed_field(ior)
table, nb = build_brick_table(packed, None)
res, raw = march_pallas(packed, pos, dirs, BUDGET, bend_scale=bend,
                        step_scale=step, k_steps=32, table=table, nb=nb,
                        return_state=True)
res = jax.tree.map(jax.block_until_ready, res)
nexec = jnp.maximum(jnp.int32(BUDGET - 1) - raw["remaining"], 0)
dp = jnp.ones_like(res.end_position)
dv = jnp.zeros_like(res.end_direction)


def timed(name, fn):
    out = fn()
    s = float(sum(jnp.sum(l.astype(jnp.float32) if l.dtype != jnp.float32 else l)
                  for l in jax.tree.leaves(out)))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(REPS)]
    for o in outs:
        float(sum(jnp.sum(l.astype(jnp.float32) if l.dtype != jnp.float32 else l)
                  for l in jax.tree.leaves(o)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: t={dt:.4f}s", flush=True)
    return dt, out


for k in (16, 32, 64):
    def bwd(k=k):
        out = _bwd_impl(table, nb, res.end_position, res.end_direction, nexec,
                        dp, dv, bend=(bend,) * 3, step=(step,) * 3, k_steps=k,
                        max_windows=None, interpret=False, budget=BUDGET)
        # reduce the big gtable on device; keep windows for the count
        return (jnp.sum(out[0]), jnp.sum(out[1]), out[4])

    dt, out = timed(f"bwd k{k}", bwd)
    wins = float(jnp.sum(out[2].astype(jnp.float64)))
    steps = float(jnp.sum(nexec.astype(jnp.float64)))
    print(f"   windows={wins:.0f} steps={steps/1e6:.1f}M "
          f"{steps/dt/1e9:.3f} Gsteps/s  per_window={dt/wins*1e6:.2f}us",
          flush=True)

gt = _bwd_impl(table, nb, res.end_position, res.end_direction, nexec, dp, dv,
               bend=(bend,) * 3, step=(step,) * 3, k_steps=32,
               max_windows=None, interpret=False, budget=BUDGET)[0]
gt = jax.block_until_ready(gt)
jf = jax.jit(lambda g: jnp.sum(fold_brickmajor_grads(g, packed.shape, nb)))
timed("fold (dense)", lambda: jf(gt))
jt = jax.jit(lambda p: jnp.sum(build_brick_table(p, None)[0]))
timed("table build (dense)", lambda: jt(packed))
jb = jax.jit(lambda f: jnp.sum(build_packed_field(f)))
timed("packed fwd", lambda: jb(ior))
