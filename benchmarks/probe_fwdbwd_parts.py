"""Attribute the fwd+bwd 256^3 train-step time across its stages, on-device.

Sync protocol: reduce every output to ONE scalar on device and fetch that —
fetching full arrays measures the axon tunnel (~17 MB/s), not the chip.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import march_pallas, build_brick_table
from volumeraytracer_tpu.kernels.march_bwd import _bwd_impl, fold_brickmajor_grads
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 131072, 512

_scal = jax.jit(lambda t: sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t)))
def sync(x):
    return float(_scal(x))

def t(f, *a, reps=2, **k):
    sync(f(*a, **k))
    t0 = time.perf_counter()
    for _ in range(reps): sync(f(*a, **k))
    return (time.perf_counter() - t0) / reps

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x*x+y*y+z*z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack([np.full(side*side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))
dirs = jnp.asarray(np.tile(np.array([[16.,0.,0.]], np.float32), (side*side, 1)))
inv = 2.0
bend = inv / float(FIX_ONE)
step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

jb = jax.jit(build_packed_field)
print("packed fwd:", t(jb, ior), flush=True)
packed = jb(ior)

@jax.jit
def packed_vjp(f, ct):
    _, vjp = jax.vjp(build_packed_field, f)
    return vjp(ct)[0]
ct = jnp.ones_like(packed)
print("packed bwd (vjp):", t(packed_vjp, ior, ct), flush=True)

jt = jax.jit(lambda p: build_brick_table(p, None)[0])
print("table build:", t(jt, packed), flush=True)
table = jt(packed)
from volumeraytracer_tpu.kernels.march_pallas import brick_grid
nb = brick_grid(packed.shape)

def fwd(k_steps=32):
    return march_pallas(packed, pos, dirs, BUDGET, bend_scale=bend, step_scale=step,
                        k_steps=k_steps, table=table, nb=nb, return_state=True)
print("fwd kernel k32:", t(fwd), flush=True)
res, raw = fwd()
res = jax.tree.map(lambda a: jax.block_until_ready(a), res)
nexec = jnp.maximum(jnp.int32(BUDGET - 1) - raw["remaining"], 0)
dp = jnp.ones_like(res.end_position); dv = jnp.zeros_like(res.end_direction)

def bwd():
    return _bwd_impl(table, nb, res.end_position, res.end_direction, nexec, dp, dv,
                     bend=(bend,)*3, step=(step,)*3, k_steps=32, max_windows=None,
                     interpret=False, budget=BUDGET)
print("bwd kernel k32:", t(bwd), flush=True)
out = bwd()
gtable = jax.block_until_ready(out[0])
jf = jax.jit(lambda g: fold_brickmajor_grads(g, packed.shape, nb))
print("grad fold:", t(jf, gtable), flush=True)
