"""Delta-time the line-table build/fold vs the point-grid versions (256^3).

Gate for the line-layout kernel redesign (benchmarks/perf_notes.md #1):
proceed only if build+fold drop well below the point layout's 66+39 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_line_table.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.line_table import (
    LL, LS, build_line_table, fold_line_grads,
)
from volumeraytracer_tpu.kernels.march_bwd import GCH, fold_brickmajor_grads
from volumeraytracer_tpu.kernels.march_pallas import (
    PVP, brick_grid, build_brick_table,
)
from volumeraytracer_tpu.ops.fields import build_packed_field

GRID = 256
REPS = 6

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.5 * np.exp(-4.0 * (x * x + y * y + z * z)).astype(np.float32))
packed0 = jax.jit(build_packed_field)(ior)
nb = brick_grid(packed0.shape)
NB = nb[0] * nb[1] * nb[2]
gp = jnp.ones((NB, GCH, PVP), jnp.float32)
gl = jnp.ones((NB, LS, LL), jnp.float32)


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
def c_point_table(f):
    p = build_packed_field(f)
    return jnp.sum(p) + jnp.sum(build_brick_table(p, None)[0])


@jax.jit
def c_line_table(f):
    p = build_packed_field(f)
    return jnp.sum(p) + jnp.sum(build_line_table(p, None)[0])


@jax.jit
def c_point_fold(f, g):
    p = build_packed_field(f)
    return jnp.sum(p) + jnp.sum(fold_brickmajor_grads(g, p.shape, nb))


@jax.jit
def c_line_fold(f, g):
    p = build_packed_field(f)
    return jnp.sum(p) + jnp.sum(fold_line_grads(g, p.shape, nb))


t0 = timed("packed carrier ", c0, ior)
tp = timed("point table    ", c_point_table, ior)
tl = timed("line  table    ", c_line_table, ior)
fp = timed("point fold     ", c_point_fold, ior, gp)
fl = timed("line  fold     ", c_line_fold, ior, gl)
print(f"table: point {(tp-t0)*1e3:.1f} ms -> line {(tl-t0)*1e3:.1f} ms")
print(f"fold : point {(fp-t0)*1e3:.1f} ms -> line {(fl-t0)*1e3:.1f} ms")
