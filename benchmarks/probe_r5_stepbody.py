"""Round-5 pure step-body microbenchmark.

Runs the EXACT forward step body (1-cell anchor, no absorb — the bench
configuration) on synthetic window-constant corner rows for W×k steps with
no DMA / gather / scheduler, measuring ns per (8,128)-lane step directly.
The production kernel measures ~0.6-1.0 µs per step slot while the body's
~100 vector ops at 1 op/cycle would be ~0.11 µs — this isolates whether the
step body itself is the wall (register spills / op latency) or the
scheduling around it.

Variants:
  full     — the production step body
  nointerp — corner interpolation replaced by a constant (isolates the
             32-FMA interp + 16-mul weight stage)
  nodiv    — ilen division replaced by a multiply (isolates the f32 divide)
  bare     — position integrate only (lower bound)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_stepbody.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.utils.profiling import enable_persistent_cache

enable_persistent_cache()

RS, RL = 8, 128
K = 64       # steps per window
W = 2048     # windows (loop iterations) per kernel call


def make_kernel(variant):
    def kernel(px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, rem_ref,
               chv_ref, opx_ref, opy_ref, opz_ref):
        chv = [[chv_ref[o * 4 + c] for c in range(4)] for o in range(8)]
        basex = jnp.zeros((RS, RL), jnp.float32)
        basey = basex
        basez = basex
        evaluable_w = jnp.ones((RS, RL), jnp.bool_)
        bendx = bendy = bendz = jnp.float32(3.05e-5)
        stepx = stepy = stepz = jnp.float32(0.515)

        def step_body(k, carry):
            px, py, pz, dx, dy, dz, rem, alive = carry
            fx = px - basex
            fy = py - basey
            fz = pz - basez
            crossed = (
                (fx < 0) | (fx >= 1.0) | (fy < 0) | (fy >= 1.0)
                | (fz < 0) | (fz >= 1.0)
            )
            rem_ok = rem > 0
            cond_l = evaluable_w & ~crossed & rem_ok

            if variant == "bare":
                ok = cond_l
                ndx, ndy, ndz = dx, dy, dz
                ilen = jnp.float32(1.0 / 256.0)
            else:
                gx = 1.0 - fx
                gy = 1.0 - fy
                gz = 1.0 - fz
                wts = (
                    gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                    fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
                )
                if variant == "nointerp":
                    interp = [wts[0] * 1e-6, wts[1] * 1e-6, wts[2] * 1e-6,
                              wts[3] * 1e-6]
                else:
                    interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                    for o in range(8):
                        for c in range(4):
                            interp[c] = interp[c] + wts[o] * chv[o][c]
                opaque = interp[3] > 0.0
                ok = cond_l & ~opaque
                ndx = dx + interp[0] * bendx
                ndy = dy + interp[1] * bendy
                ndz = dz + interp[2] * bendz
                den = ndx * ndx + ndy * ndy + ndz * ndz
                if variant == "nodiv":
                    ilen = den * jnp.float32(1.0 / 65536.0)
                else:
                    ilen = 1.0 / den
            alive_b = ok | (~(evaluable_w & ~crossed) & ((alive != 0) & rem_ok))
            alive = alive_b.astype(jnp.int32)
            px = jnp.where(ok, px + ndx * stepx * ilen, px)
            py = jnp.where(ok, py + ndy * stepy * ilen, py)
            pz = jnp.where(ok, pz + ndz * stepz * ilen, pz)
            dx = jnp.where(ok, ndx, dx)
            dy = jnp.where(ok, ndy, dy)
            dz = jnp.where(ok, ndz, dz)
            rem = rem - ok.astype(jnp.int32)
            return px, py, pz, dx, dy, dz, rem, alive

        def window(w, carry):
            # python-unrolled K-step chunk (the production default)
            for k in range(K):
                carry = step_body(k, carry)
            return carry

        state = (
            px_ref[:], py_ref[:], pz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
            rem_ref[:], jnp.ones((RS, RL), jnp.int32),
        )
        state = jax.lax.fori_loop(0, W, window, state)
        opx_ref[:] = state[0]
        opy_ref[:] = state[1]
        opz_ref[:] = state[2]

    return kernel


def run_variant(variant):
    rng = np.random.default_rng(0)
    f32 = jax.ShapeDtypeStruct((RS, RL), jnp.float32)
    px = jnp.asarray(rng.uniform(0.2, 0.3, (RS, RL)).astype(np.float32))
    py = jnp.asarray(rng.uniform(0.3, 0.7, (RS, RL)).astype(np.float32))
    pz = jnp.asarray(rng.uniform(0.3, 0.7, (RS, RL)).astype(np.float32))
    dx = jnp.full((RS, RL), 16.0, jnp.float32)
    dy = jnp.zeros((RS, RL), jnp.float32)
    dz = jnp.zeros((RS, RL), jnp.float32)
    rem = jnp.full((RS, RL), 10 ** 9, jnp.int32)
    chv = jnp.asarray(rng.normal(0, 1e-6, (32, RS, RL)).astype(np.float32))

    call = pl.pallas_call(
        make_kernel(variant),
        out_shape=[f32] * 3,
    )

    @jax.jit
    def run(px, py, pz):
        return call(px, py, pz, dx, dy, dz, rem, chv)

    out = jax.block_until_ready(run(px, py, pz))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(px, py, pz))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    ns = dt / (W * K) * 1e9
    print(f"{variant}: {dt*1e3:.2f} ms for {W}x{K} steps -> "
          f"{ns:.1f} ns per (8,128) step  "
          f"({ns*0.94:.0f} cycles @940MHz)", flush=True)


for v in ("full", "nodiv", "nointerp", "bare"):
    run_variant(v)
