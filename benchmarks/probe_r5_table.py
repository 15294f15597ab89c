"""Round-5 A/B: Pallas line-table build/fold kernels vs the XLA versions.

Scans REPS calls inside one jit (data-dependent chain via +0·sum) to beat
the relay floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_table.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.line_table import build_line_table, fold_line_grads
from volumeraytracer_tpu.kernels.line_table_pallas import (
    build_line_table_pallas, fold_line_grads_pallas,
)
from volumeraytracer_tpu.ops.fields import build_packed_field

GRID = 256
ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))
packed = build_packed_field(ior)
_, nb = build_line_table(packed, None)
nbx, nby, nbz = nb
NB = nbx * nby * nbz
rng = np.random.default_rng(0)
gtable = jnp.asarray(rng.normal(size=(NB, 72, 128)).astype(np.float32))

REPS = 8


@jax.jit
def xla_build(p):
    def body(c, _):
        t, _ = build_line_table(p + c, None)
        return jnp.sum(t) * 0.0, jnp.sum(t)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def pl_build(p):
    def body(c, _):
        t, _ = build_line_table_pallas(p + c, None)
        return jnp.sum(t) * 0.0, jnp.sum(t)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def xla_fold(g):
    def body(c, _):
        f = fold_line_grads(g + c, packed.shape, nb)
        return jnp.sum(f) * 0.0, jnp.sum(f)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def pl_fold(g):
    def body(c, _):
        f = fold_line_grads_pallas(g + c, packed.shape, nb)
        return jnp.sum(f) * 0.0, jnp.sum(f)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


# parity on chip first
t_x, _ = build_line_table(packed, None)
t_p, _ = build_line_table_pallas(packed, None)
err = float(jnp.max(jnp.abs(t_x - t_p)))
print(f"build parity maxerr {err:.3e}", flush=True)
assert err == 0.0, err
f_x = fold_line_grads(gtable, packed.shape, nb)
f_p = fold_line_grads_pallas(gtable, packed.shape, nb)
ferr = float(jnp.max(jnp.abs(f_x - f_p)) / (jnp.max(jnp.abs(f_x)) + 1e-30))
print(f"fold parity relerr {ferr:.3e}", flush=True)
assert ferr < 1e-6, ferr

for name, fn, arg in (
    ("xla_build", xla_build, packed), ("pl_build", pl_build, packed),
    ("xla_fold", xla_fold, gtable), ("pl_fold", pl_fold, gtable),
):
    float(jnp.sum(fn(arg)))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(arg)))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name}: {min(ts)*1e3:.2f} ms/call (min of 3, {REPS}-scan)",
          flush=True)
