"""Attribute the production fwd+bwd overhead vs the raw kernel parts.

tpu_verify's fused 256^3 fwd+bwd measured 4.94 s while probe_fwdbwd_parts'
stage sum is ~0.52 s.  The only production stages the parts probe skips are
the |v|=n ray init (``interp_linear(ior, pos)``) and its VJP (a 131K x
8-corner scatter-add into the 256^3 grid).  Measure each candidate fused.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_prod_overhead.py
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.ops.interp import interp_linear
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.kernels.march_bwd import march_pallas_diff
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

GRID, N_RAYS, BUDGET = 256, 131072, 512

def t(f, *a, reps=2):
    out = f(*a); jax.block_until_ready(out)
    _ = [float(np.asarray(l).ravel()[0]) for l in jax.tree.leaves(out)]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
        _ = [float(np.asarray(l).ravel()[0]) for l in jax.tree.leaves(out)]
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

# 1. n0 init alone: gather fwd
@jax.jit
def n0_fwd(f):
    return jnp.sum(interp_linear(f, pos - 0.5))
print("n0 gather fwd:", t(n0_fwd, ior), flush=True)

# 2. n0 init value_and_grad: gather + scatter vjp
@jax.jit
def n0_vg(f):
    l, g = jax.value_and_grad(lambda f: jnp.sum(interp_linear(f, pos - 0.5)))(f)
    return l, jnp.sum(g * g)
print("n0 gather+scatter vjp:", t(n0_vg, ior), flush=True)

# 3. fused fwd+bwd with n0 bypassed (constant |v| init)
def loss_non0(f, p, d):
    pk = build_packed_field(f)
    res = march_pallas_diff(pk, p - 1.0, d * 1.2, BUDGET,
                            bend_scale=bend, step_scale=step, k_steps=32)
    return jnp.sum(res.end_position[:, 1])

@jax.jit
def fwd_bwd_non0(f, p, d):
    l, g = jax.value_and_grad(loss_non0)(f, p, d)
    return l, jnp.sum(g * g)
print("fused fwd+bwd, no n0 init:", t(fwd_bwd_non0, ior, pos, dirs), flush=True)

# 4. full production path (endpoint_render pallas) — the 4.94 s suspect
from volumeraytracer_tpu.parallel.shard import endpoint_render

def loss_full(f, p, d):
    ep, _ = endpoint_render(f, p, d, BUDGET, inv, 64, kernel="pallas")
    return jnp.sum(ep[:, 1])

@jax.jit
def fwd_bwd_full(f, p, d):
    l, g = jax.value_and_grad(loss_full)(f, p, d)
    return l, jnp.sum(g * g)
print("fused fwd+bwd, full production:", t(fwd_bwd_full, ior, pos, dirs), flush=True)
