"""Window-cost attribution for the brick-march kernel (VERDICT r2 #3).

Slope-fits time(reps) over in-kernel repetitions of each *component* of the
forward kernel's per-window work (march_pallas._march_kernel), so the 48-ish
us/window total can be attributed and attacked:

  A. scalar block: per-sublane brick-id min + 8 scalar compares (the
     vector->sreg hand-off suspected to dominate)
  B. 8 corner rolls of an (8, PVP) brick + stores to the rolled buffer
     (the per-DMA-arrival work)
  C. one-hot build + 8 per-sublane (RCH, PVP)@(PVP, RL) gather matmuls
  D. the k-step march body (k=16) with a resident cache
  E. one whole window equivalent: A + C + D (DMA/roll excluded: amortized)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_window.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from volumeraytracer_tpu.kernels.march_pallas import (  # noqa: E402
    CORNER_OFF, PVP, RCH, RL, RS, TCH,
)

K_STEPS = 16


def timecall(f, *args):
    out = jax.block_until_ready(f(*args))
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(*args))
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / 3


def slope(make_f, r1, r2, name):
    f1, f2 = make_f(r1), make_f(r2)
    t1, t2 = timecall(f1), timecall(f2)
    per = (t2 - t1) / (r2 - r1)
    print(f"{name}: {per*1e6:.3f} us/window  (@{r1}={t1*1e3:.2f}ms, @{r2}={t2*1e3:.2f}ms)",
          flush=True)
    return per


def _scalar_block(ids, prev, salt):
    """Component A: the per-window scalar traffic."""
    ids = ids + salt  # defeat loop-invariant hoisting
    curs = [jnp.min(ids[s: s + 1, :]) for s in range(RS)]
    acc = jnp.zeros((), jnp.int32)
    for s in range(RS):
        acc = acc + jnp.where(curs[s] != prev, curs[s], 0)
    return ids, acc


def _gather(brickro_ref, lid, iota, precision):
    parts = []
    for s in range(RS):
        onehot = (iota == lid[s: s + 1, :]).astype(jnp.float32)
        parts.append(
            jax.lax.dot_general(
                brickro_ref[s], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        )
    return jnp.stack(parts, axis=1)  # (RCH, RS, RL)


def _steps(cache, state, k):
    px, py, pz, dx, dy, dz, rem = state

    def body(_, c):
        px, py, pz, dx, dy, dz, rem = c
        fx, fy, fz = px - jnp.floor(px), py - jnp.floor(py), pz - jnp.floor(pz)
        gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
        wts = (gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
               fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz)
        interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
        for o in range(8):
            for c_ in range(4):
                interp[c_] = interp[c_] + wts[o] * cache[o * TCH + c_]
        ok = (interp[3] <= 0.0) & (rem > 0)
        ndx = dx + interp[0] * 3e-5
        ndy = dy + interp[1] * 3e-5
        ndz = dz + interp[2] * 3e-5
        ilen = 1.0 / (ndx * ndx + ndy * ndy + ndz * ndz)
        px = jnp.where(ok, px + ndx * 0.03 * ilen, px)
        py = jnp.where(ok, py + ndy * 0.03 * ilen, py)
        pz = jnp.where(ok, pz + ndz * 0.03 * ilen, pz)
        dx = jnp.where(ok, ndx, dx)
        dy = jnp.where(ok, ndy, dy)
        dz = jnp.where(ok, ndz, dz)
        rem = rem - ok.astype(jnp.int32)
        return px, py, pz, dx, dy, dz, rem

    return jax.lax.fori_loop(0, k, body, state)


V12 = 12  # 2x1x1-cell block: 3x2x2 = 12 point views
R12 = V12 * TCH  # 96 rolled rows


def _gather12(brickro_ref, lid, iota, precision):
    """12-view gather: one (96, PVP)@(PVP, RL) matmul per sublane — still a
    single M-chunk (96 <= 128), so MXU passes match the 8-view gather."""
    parts = []
    for s in range(RS):
        onehot = (iota == lid[s: s + 1, :]).astype(jnp.float32)
        parts.append(
            jax.lax.dot_general(
                brickro_ref[s, :R12], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        )
    return jnp.stack(parts, axis=1)  # (R12, RS, RL)


def _steps12(cache, state, k):
    """March step with a 2-cell x block: per-corner row select by the lane's
    local cell bit cx (one extra where per corner-channel)."""
    px, py, pz, dx, dy, dz, rem = state

    def body(_, c):
        px, py, pz, dx, dy, dz, rem = c
        fx = px - jnp.floor(px / 2.0) * 2.0  # stand-in for px - basex in [0,2)
        fy, fz = py - jnp.floor(py), pz - jnp.floor(pz)
        cx = fx >= 1.0
        fxl = jnp.where(cx, fx - 1.0, fx)
        gx, gy, gz = 1.0 - fxl, 1.0 - fy, 1.0 - fz
        wts = (gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
               fxl * gy * gz, fxl * gy * fz, fxl * fy * gz, fxl * fy * fz)
        interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
        for o in range(8):
            dxo, dyo, dzo = o >> 2, (o >> 1) & 1, o & 1
            v0 = ((dxo * 2 + dyo) * 2 + dzo)        # view (dxo, dyo, dzo)
            v1 = (((dxo + 1) * 2 + dyo) * 2 + dzo)  # view (dxo+1, dyo, dzo)
            for c_ in range(4):
                row = jnp.where(cx, cache[v1 * TCH + c_], cache[v0 * TCH + c_])
                interp[c_] = interp[c_] + wts[o] * row
        ok = (interp[3] <= 0.0) & (rem > 0)
        ndx = dx + interp[0] * 3e-5
        ndy = dy + interp[1] * 3e-5
        ndz = dz + interp[2] * 3e-5
        ilen = 1.0 / (ndx * ndx + ndy * ndy + ndz * ndz)
        px = jnp.where(ok, px + ndx * 0.03 * ilen, px)
        py = jnp.where(ok, py + ndy * 0.03 * ilen, py)
        pz = jnp.where(ok, pz + ndz * 0.03 * ilen, pz)
        dx = jnp.where(ok, ndx, dx)
        dy = jnp.where(ok, ndy, dy)
        dz = jnp.where(ok, ndz, dz)
        rem = rem - ok.astype(jnp.int32)
        return px, py, pz, dx, dy, dz, rem

    return jax.lax.fori_loop(0, k, body, state)


def make_variant(reps, do_scalar, do_roll, do_gather, do_steps):
    def kern(ids_ref, px_ref, lid_ref, out_ref, brick_ref, brickro_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (PVP, RL), 0)
        p = px_ref[:]
        state0 = (p, p + 1.0, p + 2.0, p * 0.0 + 9.0, p * 0.0 + 1e-3,
                  p * 0.0 + 1e-3, jnp.full((RS, RL), 10 ** 6, jnp.int32))

        def window(w, carry):
            state, acc = carry
            ids = ids_ref[:]
            if do_scalar:
                ids, sacc = _scalar_block(ids, w - 1, w)
                acc = acc + sacc
            if do_roll:
                b = brick_ref[0]
                for o in range(8):
                    brickro_ref[0, o * TCH: (o + 1) * TCH] = pltpu.roll(
                        b, (PVP - CORNER_OFF[o]) % PVP, 1
                    )
            if do_gather == 12:
                cache = _gather12(brickro_ref, lid_ref[:] + (w % 2), iota,
                                  jax.lax.Precision.HIGHEST)
            elif do_gather:
                cache = _gather(brickro_ref, lid_ref[:] + (w % 2), iota,
                                jax.lax.Precision.HIGHEST)
            else:
                cache = jnp.zeros((RCH, RS, RL), jnp.float32) + jnp.float32(w)
            if do_steps == 12:
                state = _steps12(cache, state, K_STEPS)
            elif do_steps:
                state = _steps(cache, state, K_STEPS)
            else:
                state = tuple(s + cache[0, 0, 0].astype(s.dtype) for s in state)
            return state, acc

        state, acc = jax.lax.fori_loop(0, reps, window, (state0, jnp.int32(0)))
        out_ref[:] = state[0] + acc.astype(jnp.float32)

    @jax.jit
    def f(ids, px, lid, brick0, brickro0):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((RS, RL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((RS, TCH, PVP), jnp.float32),
                # R12 (=96) rows for the 12-view variants > RCH (=64)
                pltpu.VMEM((RS, max(RCH, R12), PVP), jnp.float32),
            ],
        )(ids, px, lid)

    ids = jnp.asarray(np.random.randint(0, 100, (RS, RL)), jnp.int32)
    px = jnp.asarray(np.random.rand(RS, RL) * 100 + 3, jnp.float32)
    lid = jnp.asarray(np.random.randint(0, 1200, (RS, RL)), jnp.int32)
    b0 = jnp.asarray(np.random.rand(RS, TCH, PVP), jnp.float32)
    r0 = jnp.asarray(np.random.rand(RS, max(RCH, R12), PVP), jnp.float32)
    return lambda: f(ids, px, lid, b0, r0)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    r1, r2 = 200, 1200
    results = {}
    for name, flags in [
        ("A scalar block", (True, False, False, False)),
        ("B rolls(1 sublane)", (False, True, False, False)),
        ("C onehot+8 gathers", (False, False, True, False)),
        ("D 16-step body", (False, False, False, True)),
        ("E window A+C+D", (True, False, True, True)),
        ("C12 12-view gather", (False, False, 12, False)),
        ("D12 16-step 2x1x1 body", (False, False, False, 12)),
        ("E12 window A+C12+D12", (True, False, 12, 12)),
    ]:
        results[name] = slope(lambda reps, fl=flags: make_variant(reps, *fl), r1, r2, name)
    print({k: round(v * 1e6, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
