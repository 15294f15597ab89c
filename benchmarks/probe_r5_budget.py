"""Round-5 TRUE fused-step budget: every stage timed by scanning it inside
ONE jit (the only method that measures device time on the axon relay —
see perf_notes.md measurement-model correction).

Stages of bench.py's train step:
  pack      — build_packed_field forward (log-ior + stamp convs)
  pack_vjp  — value_and_grad through build_packed_field (conv adjoints)
  build     — line-table build (Pallas)            [probe_r5_table has it]
  fold      — gradient fold (Pallas)               [probe_r5_table has it]
  fwd_k     — the forward march KERNEL only (pre-sorted inputs)
  bwd_k     — the adjoint march KERNEL only
  sort      — one brick argsort + gather of the ray state

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_budget.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()
from volumeraytracer_tpu.kernels.march_lines import (
    _march_call_lines, _bwd_call_lines, _sort_by_line_brick,
)
from volumeraytracer_tpu.kernels.line_table import build_line_table
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

import os
GRID, N_RAYS, BUDGET = 256, 128 * 1024, 512
K = int(os.environ.get("VRT_PROBE_K", "32"))
inv = 2.0
BEND = inv / float(FIX_ONE)
STEP = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
REPS = 6

ax = np.linspace(-1, 1, GRID, dtype=np.float32)
x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
ior = jnp.asarray(1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32))
packed = build_packed_field(ior)
table, nb = build_line_table(packed, None)
bounds = tuple(int(s) for s in packed.shape[:-1])
side = int(np.sqrt(N_RAYS))
ys = np.linspace(3.0, GRID - 4.0, side, dtype=np.float32)
yy, zz = np.meshgrid(ys, ys, indexing="ij")
pos_np = np.stack(
    [np.full(side * side, 1.5, np.float32), yy.ravel(), zz.ravel()], -1)
pad = N_RAYS - side * side
pos_np = np.concatenate([pos_np, np.tile(pos_np[-1:], (pad, 1))])
pos = jnp.asarray(pos_np)
dirs = jnp.asarray(np.tile(np.array([[16.0, 0, 0]], np.float32), (N_RAYS, 1)))
n = N_RAYS
rows = n // 128

order, _ = _sort_by_line_brick(pos, nb, jnp.ones((n,), bool))
pos_s = pos[order]
dirs_s = dirs[order]
alive = jnp.ones((n,), jnp.int32)
rem = jnp.full((n,), BUDGET - 1, jnp.int32)
br = jnp.ones((n,), jnp.float32)

kargs = dict(
    budget=BUDGET, k_steps=K, max_windows=2 * BUDGET + 64, interpret=False,
    bounds=bounds, nb=nb, bend=(BEND,) * 3, step=(STEP,) * 3,
    min_bright=0.0, has_absorb=False, n_tiles=n // 1024,
    precision=jax.lax.Precision.DEFAULT,
)


def timed(name, fn, *args):
    float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name}: {min(ts)*1e3:.2f} ms/iter (min of 3, {REPS}-scan)",
          flush=True)


@jax.jit
def pack(f):
    def body(c, _):
        p = build_packed_field(f + c)
        return jnp.sum(p) * 0.0, jnp.sum(p)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def pack_vjp(f):
    def body(c, _):
        val, g = jax.value_and_grad(
            lambda q: jnp.sum(build_packed_field(q) ** 2)
        )(f + c)
        return jnp.sum(g) * 0.0, val
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def fwd_k(table, px):
    def body(c, _):
        outs = _march_call_lines(
            table,
            (px + c).reshape(rows, 128), pos_s[:, 1].reshape(rows, 128),
            pos_s[:, 2].reshape(rows, 128),
            dirs_s[:, 0].reshape(rows, 128), dirs_s[:, 1].reshape(rows, 128),
            dirs_s[:, 2].reshape(rows, 128),
            rem.reshape(rows, 128), alive.reshape(rows, 128),
            br.reshape(rows, 128),
            **kargs,
        )
        s = jnp.sum(outs[6].astype(jnp.float32))
        return s * 0.0, s
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


@jax.jit
def sort_stage(p):
    def body(c, _):
        o, inv_ = _sort_by_line_brick(p + c, nb, jnp.ones((n,), bool))
        g = (p + c)[o][inv_]
        return jnp.sum(g) * 0.0, jnp.sum(g)
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


if os.environ.get("VRT_PROBE_KERNELS_ONLY", "0") != "1":
    timed("pack", pack, ior)
    timed("pack_vjp", pack_vjp, ior)
    timed("sort(x2 gather)", sort_stage, pos)
timed(f"fwd_kernel_k{K}", fwd_k, table, pos_s[:, 0])

# adjoint kernel: march once for the end state, then scan the bwd call
outs = _march_call_lines(
    table,
    pos_s[:, 0].reshape(rows, 128), pos_s[:, 1].reshape(rows, 128),
    pos_s[:, 2].reshape(rows, 128),
    dirs_s[:, 0].reshape(rows, 128), dirs_s[:, 1].reshape(rows, 128),
    dirs_s[:, 2].reshape(rows, 128),
    rem.reshape(rows, 128), alive.reshape(rows, 128), br.reshape(rows, 128),
    **kargs,
)
epx, epy, epz = (o.reshape(n) for o in outs[0:3])
evx, evy, evz = (o.reshape(n) for o in outs[3:6])
nexec = jnp.maximum(jnp.int32(BUDGET - 1) - outs[6].reshape(n), 0)
one = jnp.ones((n,), jnp.float32)
zero = jnp.zeros((n,), jnp.float32)
n_bricks = int(table.shape[0])

bkargs = dict(
    k_steps=K, max_windows=2 * BUDGET + 64, interpret=False, nb=nb,
    bend=(BEND,) * 3, step=(STEP,) * 3, n_tiles=n // 1024,
    precision=jax.lax.Precision.DEFAULT,
)


@jax.jit
def bwd_k(table, ax_):
    def body(c, _):
        gz = jnp.zeros((n_bricks, 72, 128), jnp.float32)
        outs2 = _bwd_call_lines(
            table, gz,
            epx.reshape(rows, 128), epy.reshape(rows, 128),
            epz.reshape(rows, 128),
            evx.reshape(rows, 128), evy.reshape(rows, 128),
            evz.reshape(rows, 128),
            nexec.reshape(rows, 128),
            (ax_ + c).reshape(rows, 128), one.reshape(rows, 128),
            one.reshape(rows, 128),
            zero.reshape(rows, 128), zero.reshape(rows, 128),
            zero.reshape(rows, 128),
            **bkargs,
        )
        s = jnp.sum(outs2[1])
        return s * 0.0, s
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]


timed(f"bwd_kernel_k{K}", bwd_k, table, one)
