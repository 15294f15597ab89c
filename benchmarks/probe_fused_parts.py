"""Delta-attribution of the fused train step's stages.

Standalone dispatch timings carry an unstable 0.03-0.10 s relay floor, so
each stage is measured as a DELTA between two fused programs sharing the
same carrier — floors cancel:

  table = t(packed+table) - t(packed)
  fold  = t(packed+fold)  - t(packed)
  pvjp  = t(packed+packed_vjp) - t(packed)
  n0b   = t(packed+n0 value_and_grad) - t(packed)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_fused_parts.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_bwd import GCH, fold_brickmajor_grads
from volumeraytracer_tpu.kernels.march_pallas import (
    PVP, brick_grid, build_brick_table,
)
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.ops.interp import interp_linear

GRID, N_RAYS = 256, 131072
REPS = 6

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x * x + y * y + z * z)).astype(np.float32))
side = int(np.sqrt(N_RAYS))
ys = np.linspace(8.0, GRID - 8.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos = jnp.asarray(np.stack(
    [np.full(side * side, 2.0, np.float32), yy.ravel(), zz.ravel()], -1))

packed0 = jax.jit(build_packed_field)(ior)
nb = brick_grid(packed0.shape)
NB = nb[0] * nb[1] * nb[2]
gt = jnp.ones((NB, GCH, PVP), jnp.float32)
ct = jnp.ones_like(packed0)


def timed(name, fn, *a):
    out = fn(*a)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(REPS)]
    for o in outs:
        float(o)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt:.4f}s", flush=True)
    return dt


@jax.jit
def c0(f):
    return jnp.sum(build_packed_field(f))


@jax.jit
def c1(f):
    p = build_packed_field(f)
    t, _ = build_brick_table(p, None)
    return jnp.sum(p) + jnp.sum(t)


@jax.jit
def c2(f, g):
    p = build_packed_field(f)
    return jnp.sum(p) + jnp.sum(fold_brickmajor_grads(g, p.shape, nb))


@jax.jit
def c3(f, c):
    p, vjp = jax.vjp(build_packed_field, f)
    return jnp.sum(p) + jnp.sum(vjp(c)[0])


@jax.jit
def c4(f):
    p = build_packed_field(f)
    l, g = jax.value_and_grad(
        lambda ff: jnp.sum(interp_linear(ff, pos - 0.5)))(f)
    return jnp.sum(p) + l + jnp.sum(g * g)


t0 = timed("packed           ", c0, ior)
t1 = timed("packed+table     ", c1, ior)
t2 = timed("packed+fold      ", c2, ior, gt)
t3 = timed("packed+packedvjp ", c3, ior, ct)
t4 = timed("packed+n0 vg     ", c4, ior)
print(f"table: {(t1-t0)*1e3:.1f} ms  fold: {(t2-t0)*1e3:.1f} ms  "
      f"packed_vjp: {(t3-t0)*1e3:.1f} ms  n0_vg: {(t4-t0)*1e3:.1f} ms  "
      f"(packed carrier {t0*1e3:.1f} ms)")
