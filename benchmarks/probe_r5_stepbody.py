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


def make_kernel(variant, structure="flat", chv_mode="refs"):
    def kernel(px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, rem_ref,
               chv_ref, opx_ref, opy_ref, opz_ref):
        if chv_mode == "values":
            # corner rows as COMPUTED VALUES (the production dataflow: the
            # gather/zselect outputs feed the step loop as loop-invariant
            # values, not ref loads)
            base_rows = chv_ref[...] * (1.0 + px_ref[0, 0] * 1e-9)
            chv = [
                [base_rows[o * 4 + c] for c in range(4)] for o in range(8)
            ]
        else:
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
            if variant == "a2x":
                # the EXACT production 2x-anchor step body (march_lines
                # anchor2x=True, has_absorb=False): dual-sub-cell corner
                # accumulation + per-channel select
                crossed = (
                    (fx < 0) | (fx >= 2.0) | (fy < 0) | (fy >= 1.0)
                    | (fz < 0) | (fz >= 1.0)
                )
                rem_ok = rem > 0
                cond_l = evaluable_w & ~crossed & rem_ok
                sel = fx >= 1.0
                fxl = jnp.where(sel, fx - 1.0, fx)
                gx = 1.0 - fxl
                gy = 1.0 - fy
                gz = 1.0 - fz
                wts = (
                    gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                    fxl * gy * gz, fxl * gy * fz, fxl * fy * gz,
                    fxl * fy * fz,
                )
                acc_lo = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                acc_hi = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                for o in range(8):
                    for c in range(4):
                        acc_lo[c] = acc_lo[c] + wts[o] * chv[o][c]
                        acc_hi[c] = acc_hi[c] + wts[o] * chv[(o + 3) % 8][c]
                interp = [
                    jnp.where(sel, acc_hi[c], acc_lo[c]) for c in range(4)
                ]
                opaque = interp[3] > 0.0
                ok = cond_l & ~opaque
                ndx = dx + interp[0] * bendx
                ndy = dy + interp[1] * bendy
                ndz = dz + interp[2] * bendz
                ilen = 1.0 / (ndx * ndx + ndy * ndy + ndz * ndz)
                alive_b = ok | (
                    ~(evaluable_w & ~crossed) & ((alive != 0) & rem_ok)
                )
                alive = alive_b.astype(jnp.int32)
                px = jnp.where(ok, px + ndx * stepx * ilen, px)
                py = jnp.where(ok, py + ndy * stepy * ilen, py)
                pz = jnp.where(ok, pz + ndz * stepz * ilen, pz)
                dx = jnp.where(ok, ndx, dx)
                dy = jnp.where(ok, ndy, dy)
                dz = jnp.where(ok, ndz, dz)
                rem = rem - ok.astype(jnp.int32)
                return px, py, pz, dx, dy, dz, rem, alive
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
            if structure in ("live", "livechunk"):
                # keep every step LIVE: re-wrap positions into the anchor
                # cell at window start (slow rays: |v|=64 -> ~0.008
                # voxel/step, 64 steps stay inside the cell).  The original
                # probe's rays crossed in window 1 and ran 99.95% DEAD
                # steps — dead steps measured 25x cheaper than live ones.
                px0, py0, pz0 = carry[0], carry[1], carry[2]
                carry = (px0 - jnp.floor(px0), py0 - jnp.floor(py0),
                         pz0 - jnp.floor(pz0)) + carry[3:]
                if structure == "livechunk":
                    def ch_cond(c):
                        j, cont, _ = c
                        return (j < K // 8) & cont

                    def ch_body(c):
                        j, _, s = c
                        for k in range(8):
                            s = step_body(k, s)
                        cont = jnp.any(s[0] < 1e9)
                        return j + 1, cont, s

                    _, _, carry = jax.lax.while_loop(
                        ch_cond, ch_body,
                        (jnp.int32(0), jnp.asarray(True), carry),
                    )
                    return carry
                for k in range(K):
                    carry = step_body(k, carry)
                return carry
            if structure == "chunked":
                # the production chunk structure: 8-step unrolled chunks in
                # an early-exit while_loop
                def ch_cond(c):
                    j, cont, _ = c
                    return (j < K // 8) & cont

                def ch_body(c):
                    j, _, s = c
                    for k in range(8):
                        s = step_body(k, s)
                    fx2 = s[0] - basex
                    cont = jnp.any(evaluable_w & (fx2 < 1.0) & (s[6] > 0))
                    return j + 1, cont, s

                _, _, carry = jax.lax.while_loop(
                    ch_cond, ch_body, (jnp.int32(0), jnp.asarray(True), carry)
                )
                return carry
            # flat: python-unrolled K steps
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
    dx = jnp.full((RS, RL), 64.0, jnp.float32)
    dy = jnp.zeros((RS, RL), jnp.float32)
    dz = jnp.zeros((RS, RL), jnp.float32)
    rem = jnp.full((RS, RL), 10 ** 9, jnp.int32)
    chv = jnp.asarray(rng.normal(0, 1e-6, (32, RS, RL)).astype(np.float32))

    call = pl.pallas_call(
        make_kernel(*variant) if isinstance(variant, tuple)
        else make_kernel(variant),
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
    print(f"{variant!r}: {dt*1e3:.2f} ms for {W}x{K} steps -> "
          f"{ns:.1f} ns per (8,128) step  "
          f"({ns*0.94:.0f} cycles @940MHz)", flush=True)


for v in (
    "full",
    ("full", "live", "refs"),
    ("full", "livechunk", "refs"),
    ("full", "live", "values"),
):
    run_variant(v)


# ---------------------------------------------------------------------------
# window-stage attribution: the full production gather stage (one-hot build,
# 2x6-block dual dots, 2 z-selects, corner channels, per-lane merge) ahead of
# the flat 64-step loop — no DMA/scheduler.  Compares against the step-only
# numbers above to attribute the production window's ~50 us of non-step cost.
# ---------------------------------------------------------------------------
LS_, LL_, LPY_, LPZ_, TCH_ = 72, 128, 11, 9, 8
NBLK = 6  # 2x anchor


def gather_kernel(gmode):
    def kernel(px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, rem_ref,
               brick_ref, opx_ref, opy_ref, opz_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (LL_, NBLK * RL), 0)
        bendx = jnp.float32(3.05e-5)
        stepx = jnp.float32(0.515)

        def window(w, carry):
            px, py, pz, dx, dy, dz, rem, alive = carry
            lin = (
                jnp.clip(px.astype(jnp.int32), 0, 9) * LPY_
                + jnp.clip(py.astype(jnp.int32), 0, 9)
            )
            lz = jnp.clip(pz.astype(jnp.int32), 0, 7)
            offs = (0, 1, LPY_, LPY_ + 1, 2 * LPY_, 2 * LPY_ + 1)

            def zselect(G, lz6):
                lzv = lz6[None]
                acc0 = jnp.zeros((TCH_,) + G.shape[1:], jnp.float32)
                acc1 = jnp.zeros((TCH_,) + G.shape[1:], jnp.float32)
                prev = None
                for z in range(LPZ_):
                    m = (lzv == z).astype(jnp.float32)
                    blk = G[z * TCH_ : (z + 1) * TCH_]
                    acc0 = acc0 + blk * m
                    if prev is not None:
                        acc1 = acc1 + blk * prev
                    prev = m
                return acc0, acc1

            if gmode in ("dots", "full"):
                parts = []
                for s in range(RS):
                    lin_s = lin[s : s + 1, :]
                    onehot = (iota == jnp.concatenate(
                        [lin_s + o for o in offs], axis=1
                    )).astype(jnp.float32)
                    d = tuple(
                        jax.lax.dot_general(
                            brick_ref[2 * s + j], onehot,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for j in (0, 1)
                    )
                    parts.append(d)
            if gmode == "full":
                lz6 = jnp.concatenate([lz] * NBLK, axis=1)
                Ga = jnp.stack([p[0] for p in parts], axis=1)
                Gb = jnp.stack([p[1] for p in parts], axis=1)
                a0a, a1a = zselect(Ga, lz6)
                a0b, a1b = zselect(Gb, lz6)
                in1 = py > 5.0

                def cc2x(acc0, acc1):
                    out = []
                    for xoff in (0, 1):
                        for dx_ in (0, 1):
                            for dy_ in (0, 1):
                                j = (dx_ + xoff) * 2 + dy_
                                sl = slice(j * RL, (j + 1) * RL)
                                for acc in (acc0, acc1):
                                    out.append(
                                        [acc[c, :, sl] + acc[5, :, sl]
                                         for c in range(4)]
                                    )
                    return out

                rows_a = cc2x(a0a, a1a)
                rows_b = cc2x(a0b, a1b)
                chv = [
                    [jnp.where(in1, rb, ra) for ra, rb in zip(la, lb)]
                    for la, lb in zip(rows_a, rows_b)
                ]
            elif gmode == "dots":
                chv = [
                    [p[0][:4, 0, s * 0 : RL] for _ in range(4)]
                    for s, p in enumerate(parts[:1])
                ] * 16
                chv = [[r[0:RS] if r.shape[0] >= RS else
                        jnp.zeros((RS, RL)) for r in rows] for rows in chv]
                chv = [[jnp.zeros((RS, RL), jnp.float32)] * 4] * 16
            else:
                chv = [[jnp.zeros((RS, RL), jnp.float32)] * 4] * 16

            def step_body(k, carry):
                px, py, pz, dx, dy, dz, rem, alive = carry
                fx = px - 0.0
                sel = fx >= 1.0
                interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                for o in range(8):
                    for c in range(4):
                        lo = chv[o][c]
                        hi = chv[8 + o][c]
                        interp[c] = interp[c] + fx * jnp.where(sel, hi, lo)
                ok = (interp[3] <= 0.0) & (rem > 0)
                ndx = dx + interp[0] * bendx
                ilen = 1.0 / (ndx * ndx + dy * dy + dz * dz)
                px = jnp.where(ok, px + ndx * stepx * ilen, px)
                rem = rem - ok.astype(jnp.int32)
                return px, py, pz, ndx, dy, dz, rem, alive

            carry = (px, py, pz, dx, dy, dz, rem, alive)
            for k in range(K):
                carry = step_body(k, carry)
            return carry

        state = (
            px_ref[:], py_ref[:], pz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
            rem_ref[:], jnp.ones((RS, RL), jnp.int32),
        )
        state = jax.lax.fori_loop(0, WG, window, state)
        opx_ref[:] = state[0]
        opy_ref[:] = state[1]
        opz_ref[:] = state[2]

    return kernel


WG = 512


def run_gather(gmode):
    rng = np.random.default_rng(0)
    f32 = jax.ShapeDtypeStruct((RS, RL), jnp.float32)
    px = jnp.asarray(rng.uniform(0.2, 9.0, (RS, RL)).astype(np.float32))
    py = jnp.asarray(rng.uniform(0.3, 9.0, (RS, RL)).astype(np.float32))
    pz = jnp.asarray(rng.uniform(0.3, 7.0, (RS, RL)).astype(np.float32))
    dx = jnp.full((RS, RL), 64.0, jnp.float32)
    dy = jnp.zeros((RS, RL), jnp.float32)
    dz = jnp.zeros((RS, RL), jnp.float32)
    rem = jnp.full((RS, RL), 10 ** 9, jnp.int32)
    brick = jnp.asarray(
        rng.normal(0, 1e-6, (2 * RS, LS_, LL_)).astype(np.float32)
    )

    call = pl.pallas_call(gather_kernel(gmode), out_shape=[f32] * 3)

    @jax.jit
    def run(px, py, pz):
        return call(px, py, pz, dx, dy, dz, rem, brick)

    jax.block_until_ready(run(px, py, pz))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(px, py, pz))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    us = dt / WG * 1e6
    print(f"gather[{gmode}]: {dt*1e3:.2f} ms for {WG} windows x {K} steps -> "
          f"{us:.2f} us per window", flush=True)


for gm in ("none", "full"):
    run_gather(gm)
