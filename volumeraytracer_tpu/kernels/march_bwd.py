"""Pallas TPU backward march — reverse-replay adjoint kernel + custom_vjp.

The reference has **no backward pass at all** (SURVEY.md §0: differentiability
is a new requirement); this kernel supplies the gradient path for the
brick-walking forward kernel (``march_pallas``) at kernel speed instead of
the XLA scan-remat fallback (``ops.march.march_float(differentiable=True)``).

Key idea — the eikonal step is an *algebraically invertible* integrator
(/root/reference/src/cuda_volume_raytracer.cu:344-347 in float semantics):

    forward:   u = v + bend ⊙ g(x);        x' = x + step ⊙ u / |u|²
    reverse:   x = x' − step ⊙ u / |u|²;   v = u − bend ⊙ g(x)

so the backward pass needs **no saved trajectory**: starting from the end
state (pos, dir) it re-marches *backwards*, reconstructing every executed
step (the executed-step count per ray is the only residual), and pushes the
adjoints along:

    ū_j  = v̄'_j + step_j·ilen·x̄'_j − 2 u_j ilen² Σ_i step_i u_i x̄'_i
    x̄_j  = x̄'_j + Σ_o (∂w_o/∂x_j) Σ_c C_oc bend_c ū_c   (weight Jacobian)
    v̄    = ū
    C̄_oc += w_o · bend_c · ū_c                      (field corner gradients)

Float caveat: ``fl((x+t)-t) != x`` exactly, so the reconstruction drifts by
O(ulp) per step; the drift only matters when it flips a floor() near a cell
boundary (different corners feed g).  ``tests/test_pallas_bwd.py`` bounds the
drift empirically via the kernel's ``recon_pos`` diagnostic output (the fully
reverse-reconstructed start position).

Structure mirrors the forward kernel exactly (per-sublane point-grid brick
residency, rolled corner views, window scheduler, one-hot MXU gather — see
march_pallas.py): the gather's transpose is the scatter ``d_rolled +=
d_cache @ onehotᵀ``, the same systolic-array trick.  Per-corner gradients
accumulate in VMEM and are roll-folded onto the brick's point grid and
flushed to a brick-major HBM grad table by read-modify-write DMA whenever
that sublane's scheduler switches bricks (the TPU grid and the in-kernel
flushes are sequential ⇒ no races); the table arrives as an aliased zeros
input (``input_output_aliases``).

Termination conditions (opaque surface .cu:343, absorption darkness
.cu:337-341, bounds exit) are treated as non-differentiable
(straight-through): executed-step counts are constants of the backward pass,
and the opacity/absorption channels receive zero gradient from this kernel.
For opacity/translucency gradients use the XLA path's soft-termination
relaxation (``ops.march.march_float(soft_opacity_tau=...)``), which carries a
differentiable transmittance alongside the hard march.

A backward tile that exhausts ``max_windows`` has only partially propagated
its adjoints; ``f_bwd`` POISONS all gradients with NaN in that case (see the
comment there) rather than returning silently wrong values.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import TraceResult
from .march_pallas import (
    BX,
    BY,
    BZ,
    CORNER_OFF,
    DEAD_ID,
    LCH,
    NCH,
    NLO,
    PV,
    PVP,
    PX,
    PY,
    PZ,
    R,
    RCH,
    RL,
    RS,
    TCH,
    absorption_fraction,
    build_brick_table,
    march_pallas,
)

# grad-table channel STRIDE: one gradient row per field channel at each
# POINT of the brick's point grid (dx, dy, dz live; the opacity slot and
# rows 4-7 stay 0) — corner contributions are roll-folded onto points at
# flush time, so the HBM table carries no 8× corner duplication.  The
# stride is 8 (not the 4 live channels) so the RMW DMA slices
# ``gout[b]`` = (1, GCH, PVP) meet the f32 8-sublane Mosaic tiling rule,
# same as the forward table's TCH.
GCH = 8
# in-VMEM accumulator rows: 8 corners × (3 grads + 5 zeros) before the fold
GROWS = 8 * GCH



def _trace_is_eager() -> bool:
    """True when NOT under a jit/grad/vmap trace (the host-side path
    unscramble is only possible eagerly)."""
    try:
        from jax._src.core import trace_state_clean

        return bool(trace_state_clean())
    except Exception:
        try:
            return type(jax.core.trace_ctx.trace).__name__ == "EvalTrace"
        except Exception:
            return True

def _bwd_kernel(
    # inputs
    table_ref,  # (NB, TCH, PVP) f32 ANY/HBM — forward point-grid table
    gin_ref,  # (NB, GCH, PVP) f32 ANY/HBM — zeros, aliased to gout_ref
    px_ref, py_ref, pz_ref,  # (8, 128) f32 end positions
    vx_ref, vy_ref, vz_ref,  # (8, 128) f32 end directions
    rrem_ref,  # (8, 128) i32 executed-step counts (steps left to reverse)
    apx_ref, apy_ref, apz_ref,  # cotangent of end position
    avx_ref, avy_ref, avz_ref,  # cotangent of end direction
    # outputs
    gout_ref,  # (NB, GCH, PVP) f32 ANY/HBM — brick-major point-grad table
    oax_ref, oay_ref, oaz_ref,  # d start position
    obx_ref, oby_ref, obz_ref,  # d start (working) direction
    orx_ref, ory_ref, orz_ref,  # reconstructed start position (diagnostic)
    ow_ref,  # windows used (saturation detector)
    # scratch
    brick_ref,  # (RS, TCH, PVP) f32 per-sublane resident point-grid bricks
    brickro_ref,  # (RS, RCH, PVP) f32 rolled corner-view copies
    gbrick_ref,  # (RS, GROWS, PVP) f32 per-corner grad accumulators
    tmp_ref,  # (1, GCH, PVP) f32 RMW staging
    dma_sem, g_sem,
    *,
    max_windows: int,
    k_steps: int,
    nb: Tuple[int, int, int],
    bend: Tuple[float, float, float],
    step: Tuple[float, float, float],
    precision,
):
    ex, ey, ez = (jnp.float32(b) for b in bend)
    sx, sy, sz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)
    iota = jax.lax.broadcasted_iota(jnp.int32, (PVP, RL), 0)

    gbrick_ref[:] = jnp.zeros((RS, GROWS, PVP), jnp.float32)

    def _flush(s, brick_id):
        """Serialized RMW-accumulate of sublane s's grads into HBM.

        The per-corner accumulator rows are roll-folded onto the brick's
        point grid here (inverse of the gather's corner rolls): the
        gradient for point q from corner o lives at lane q − CORNER_OFF[o]
        of row o — rolling by +CORNER_OFF[o] re-aligns it; the circular
        tail is zero (anchors stop at lane 1200 < PVP − max offset)."""
        rd = pltpu.make_async_copy(
            gout_ref.at[pl.ds(brick_id, 1)], tmp_ref, g_sem
        )
        rd.start()
        rd.wait()
        folded = tmp_ref[0]
        for o in range(8):
            folded = folded + pltpu.roll(
                gbrick_ref[s, o * GCH : (o + 1) * GCH], CORNER_OFF[o], 1
            )
        tmp_ref[0] = folded
        wr = pltpu.make_async_copy(
            tmp_ref, gout_ref.at[pl.ds(brick_id, 1)], g_sem
        )
        wr.start()
        wr.wait()
        gbrick_ref[s] = jnp.zeros((GROWS, PVP), jnp.float32)

    state0 = (
        px_ref[:], py_ref[:], pz_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:],
        apx_ref[:], apy_ref[:], apz_ref[:],
        avx_ref[:], avy_ref[:], avz_ref[:],
        rrem_ref[:],
    )

    def cond(carry):
        w, prev_ids, state = carry
        return (w < max_windows) & jnp.any(state[12] > 0)

    def window_body(carry):
        w, prev_ids, state = carry
        px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem = state
        live = rrem > 0

        # reverse candidate x_k = x_{k+1} − step ⊙ u / |u|² anchors the
        # window: the brick/cell of the *pre-step* position, exactly where
        # the forward evaluated g (.cu:342)
        ilen0 = 1.0 / (vx * vx + vy * vy + vz * vz)
        cx = px - vx * sx * ilen0
        cy = py - vy * sy * ilen0
        cz = pz - vz * sz * ilen0
        fpx = jnp.floor(cx)
        fpy = jnp.floor(cy)
        fpz = jnp.floor(cz)
        cbx = jnp.clip(fpx.astype(jnp.int32) // BX, 0, nbx - 1)
        cby = jnp.clip(fpy.astype(jnp.int32) // BY, 0, nby - 1)
        cbz = jnp.clip(fpz.astype(jnp.int32) // BZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(live, ids, DEAD_ID)
        # ONE lane-reduce + ONE any-changed scalar gate (see march_pallas):
        # scalar extracts and conditional regions only on switch windows.
        cur_min = jnp.min(ids, axis=1, keepdims=True)  # (8, 1) vector
        changed_v = cur_min != prev_ids

        # flush each switching sublane's grad accumulator (serialized RMW),
        # then start all changed forward-brick loads overlapped, then wait.
        # prev adopts cur_min UNCONDITIONALLY below (including DEAD): a
        # sublane whose rays all finished flushes exactly once — the old
        # keep-prev scheme re-flushed a zeroed accumulator by RMW DMA on
        # EVERY remaining window of the tile.
        @pl.when(jnp.any(changed_v))
        def _():
            curs = [cur_min[s, 0] for s in range(RS)]
            prevs = [prev_ids[s, 0] for s in range(RS)]
            for s in range(RS):
                @pl.when(
                    (curs[s] != prevs[s])
                    & (prevs[s] >= 0)
                    & (prevs[s] != DEAD_ID)
                )
                def _(s=s):
                    _flush(s, prevs[s])
            for s in range(RS):
                @pl.when((curs[s] != prevs[s]) & (curs[s] != DEAD_ID))
                def _(s=s):
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(curs[s], 1)],
                        brick_ref.at[pl.ds(s, 1)],
                        dma_sem.at[s],
                    ).start()
            for s in range(RS):
                @pl.when((curs[s] != prevs[s]) & (curs[s] != DEAD_ID))
                def _(s=s):
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(curs[s], 1)],
                        brick_ref.at[pl.ds(s, 1)],
                        dma_sem.at[s],
                    ).wait()
                    b = brick_ref[s]
                    for o in range(8):
                        # corner views by lane roll (see march_pallas)
                        # pltpu.roll requires a non-negative shift:
                        # roll(x, PVP - k) == roll(x, -k) on a PVP-circle
                        brickro_ref[s, o * TCH : (o + 1) * TCH] = pltpu.roll(
                            b, (PVP - CORNER_OFF[o]) % PVP, 1
                        )
        new_ids = cur_min  # (8, 1); DEAD adopted — its flush already ran

        cur_col = jnp.broadcast_to(cur_min, (RS, RL))
        in_cur = live & (ids == cur_col)

        # local cell id inside each sublane's brick (valid for in_cur lanes)
        b2 = cur_col // nbz
        oxf = ((b2 // nby) * BX).astype(jnp.float32)
        oyf = ((b2 % nby) * BY).astype(jnp.float32)
        ozf = ((cur_col % nbz) * BZ).astype(jnp.float32)
        lx = jnp.clip((fpx - oxf).astype(jnp.int32), 0, BX - 1)
        ly = jnp.clip((fpy - oyf).astype(jnp.int32), 0, BY - 1)
        lz = jnp.clip((fpz - ozf).astype(jnp.int32), 0, BZ - 1)
        lid = (lx * PY + ly) * PZ + lz  # anchor POINT id, (8, 128) in [0, PV)

        # one-hot gather of all corners' rows from the rolled copies
        # (≙ forward refresh); the one-hots are REBUILT at scatter time
        # rather than kept live across the step loop — 8 × (PVP, RL) f32
        # retained buffers blow the scoped-VMEM budget
        parts = []
        for s in range(RS):
            onehot = (iota == lid[s : s + 1, :]).astype(jnp.float32)
            parts.append(
                jax.lax.dot_general(
                    brickro_ref[s],
                    onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            )  # (RCH, RL)
        cache = jnp.stack(parts, axis=1)  # (RCH, RS, RL)

        # combine the bf16-split gradient rows once per window (hi + lo; see
        # march_pallas TCH layout) — the step loop reads 3 rows per corner
        chv = [
            [cache[o * TCH + c] + cache[o * TCH + LCH + c] for c in range(NLO)]
            for o in range(8)
        ]

        basex, basey, basez = fpx, fpy, fpz
        evaluable_w = in_cur  # already masked by live

        zero = jnp.zeros((RS, RL), jnp.float32)
        dC = [zero] * (8 * 3)  # corner grads, [o*3+c] layout, c ∈ {x,y,z}

        def step_body(k, carry):
            (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem, dC) = carry
            ilen = 1.0 / (vx * vx + vy * vy + vz * vz)
            candx = px - vx * sx * ilen
            candy = py - vy * sy * ilen
            candz = pz - vz * sz * ilen
            fx = candx - basex
            fy = candy - basey
            fz = candz - basez
            crossed = (
                (fx < 0) | (fx >= 1.0) | (fy < 0) | (fy >= 1.0) | (fz < 0) | (fz >= 1.0)
            )
            ok = evaluable_w & ~crossed & (rrem > 0)

            gx_ = 1.0 - fx
            gy_ = 1.0 - fy
            gz_ = 1.0 - fz
            # corner weights + frac-derivatives, product((0,1)^3) order
            wts = (
                gx_ * gy_ * gz_, gx_ * gy_ * fz, gx_ * fy * gz_, gx_ * fy * fz,
                fx * gy_ * gz_, fx * gy_ * fz, fx * fy * gz_, fx * fy * fz,
            )
            yz = (gy_ * gz_, gy_ * fz, fy * gz_, fy * fz)
            dwx = (-yz[0], -yz[1], -yz[2], -yz[3], yz[0], yz[1], yz[2], yz[3])
            xz = (gx_ * gz_, gx_ * fz, fx * gz_, fx * fz)
            dwy = (-xz[0], -xz[1], xz[0], xz[1], -xz[2], -xz[3], xz[2], xz[3])
            xy = (gx_ * gy_, gx_ * fy, fx * gy_, fx * fy)
            dwz = (-xy[0], xy[0], -xy[1], xy[1], -xy[2], xy[2], -xy[3], xy[3])

            g0 = zero
            g1 = zero
            g2 = zero
            for o in range(8):
                g0 = g0 + wts[o] * chv[o][0]
                g1 = g1 + wts[o] * chv[o][1]
                g2 = g2 + wts[o] * chv[o][2]

            # reconstruct v_k (pre-bend direction)
            nvx = vx - g0 * ex
            nvy = vy - g1 * ey
            nvz = vz - g2 * ez

            # adjoint through x' = x + step ⊙ u·ilen and v' = u (u = current v)
            t = sx * vx * ax + sy * vy * ay + sz * vz * az
            il2 = ilen * ilen
            ubx = bx + sx * ilen * ax - 2.0 * vx * il2 * t
            uby = by + sy * ilen * ay - 2.0 * vy * il2 * t
            ubz = bz + sz * ilen * az - 2.0 * vz * il2 * t
            h0 = ex * ubx
            h1 = ey * uby
            h2 = ez * ubz

            # position adjoint through g's trilinear weights + field grads
            Gx = zero
            Gy = zero
            Gz = zero
            okf = jnp.where(ok, 1.0, 0.0)
            ndC = list(dC)
            for o in range(8):
                m = (
                    chv[o][0] * h0
                    + chv[o][1] * h1
                    + chv[o][2] * h2
                )
                Gx = Gx + dwx[o] * m
                Gy = Gy + dwy[o] * m
                Gz = Gz + dwz[o] * m
                wok = wts[o] * okf
                ndC[o * 3 + 0] = dC[o * 3 + 0] + wok * h0
                ndC[o * 3 + 1] = dC[o * 3 + 1] + wok * h1
                ndC[o * 3 + 2] = dC[o * 3 + 2] + wok * h2

            px = jnp.where(ok, candx, px)
            py = jnp.where(ok, candy, py)
            pz = jnp.where(ok, candz, pz)
            vx = jnp.where(ok, nvx, vx)
            vy = jnp.where(ok, nvy, vy)
            vz = jnp.where(ok, nvz, vz)
            ax = jnp.where(ok, ax + Gx, ax)
            ay = jnp.where(ok, ay + Gy, ay)
            az = jnp.where(ok, az + Gz, az)
            bx = jnp.where(ok, ubx, bx)
            by = jnp.where(ok, uby, by)
            bz = jnp.where(ok, ubz, bz)
            rrem = rrem - ok.astype(jnp.int32)
            return (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem, ndC)

        # chunked step loop with early exit (see march_pallas): reverse-step
        # eligibility is monotone non-increasing within a window, so skip
        # the dead tail of the k-loop once no ray can reverse further —
        # the adjoint body is ~3x the forward body, so the ~half-dead
        # iterations at k=32 are the largest per-window cost
        step_chunk = 8 if k_steps % 8 == 0 else k_steps
        n_chunks = k_steps // step_chunk

        def ch_cond(c):
            j, cont, _, _ = c
            return (j < n_chunks) & cont

        def ch_body(c):
            j, _, s, dC = c
            out = jax.lax.fori_loop(0, step_chunk, step_body, s + (dC,))
            s = out[:13]
            dC = out[13]
            ilen2 = 1.0 / (s[3] * s[3] + s[4] * s[4] + s[5] * s[5])
            fx2 = (s[0] - s[3] * sx * ilen2) - basex
            fy2 = (s[1] - s[4] * sy * ilen2) - basey
            fz2 = (s[2] - s[5] * sz * ilen2) - basez
            crossed2 = (
                (fx2 < 0) | (fx2 >= 1.0) | (fy2 < 0) | (fy2 >= 1.0)
                | (fz2 < 0) | (fz2 >= 1.0)
            )
            cont = jnp.any(evaluable_w & ~crossed2 & (s[12] > 0))
            return j + 1, cont, s, dC

        _, _, state, dC = jax.lax.while_loop(
            ch_cond,
            ch_body,
            (
                jnp.int32(0),
                jnp.asarray(True),
                (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem),
                dC,  # list pytree, matching step_body's ndC
            ),
        )

        # transpose-scatter: per-sublane (GROWS, RL) grad rows → per-corner
        # anchor-point grads via d_rolled_s += d_cache_s @ onehot_sᵀ (the
        # gather's transpose); the corner roll-fold happens once per flush
        rows = []
        for o in range(8):
            for c in range(3):
                rows.append(dC[o * 3 + c])
            # opacity channel (straight-through) + 8-sublane stride padding
            rows.extend([zero] * (GCH - 3))
        drows = jnp.stack(rows, axis=0)  # (GROWS, RS, RL)
        for s in range(RS):
            onehot = (iota == lid[s : s + 1, :]).astype(jnp.float32)
            # the gradient rows are arbitrary f32 (NOT bf16-representable
            # like the forward table), so a single DEFAULT-precision pass
            # would round them to 2^-8: split hi/lo at runtime — two
            # single-pass dots reconstruct ~2^-17, still cheaper than one
            # HIGHEST multi-pass dot
            d = drows[:, s, :]
            dhi = d.astype(jnp.bfloat16).astype(jnp.float32)
            dlo = d - dhi
            contrib = jax.lax.dot_general(
                dhi,
                onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            ) + jax.lax.dot_general(
                dlo,
                onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (GROWS, PVP)
            gbrick_ref[s] = gbrick_ref[s] + contrib

        return w + 1, new_ids, tuple(state)

    w, last_ids, state = jax.lax.while_loop(
        cond, window_body, (jnp.int32(0), jnp.full((RS, 1), -1, jnp.int32), state0)
    )
    for s in range(RS):
        last_s = last_ids[s, 0]
        @pl.when((last_s >= 0) & (last_s != DEAD_ID))
        def _(s=s, last_s=last_s):
            _flush(s, last_s)

    (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem) = state
    oax_ref[:] = ax
    oay_ref[:] = ay
    oaz_ref[:] = az
    obx_ref[:] = bx
    oby_ref[:] = by
    obz_ref[:] = bz
    orx_ref[:] = px
    ory_ref[:] = py
    orz_ref[:] = pz
    # windows used, sign-encoding truncation: a NEGATIVE value -(w+1) means
    # the replay exited with residual reverse budget (any rrem > 0) — i.e.
    # partially propagated adjoints.  The window count alone cannot detect
    # this: a tile that legitimately finishes in exactly max_windows windows
    # also exits with w == max_windows.
    resid = jnp.any(rrem > 0)
    ow_ref[:] = jnp.full((RS, RL), 1, jnp.int32) * jnp.where(resid, -(w + 1), w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_steps", "max_windows", "interpret", "nb", "bend", "step",
        "n_tiles", "precision",
    ),
)
def _bwd_call(
    table, gzeros, px, py, pz, vx, vy, vz, rrem, apx, apy, apz, avx, avy, avz,
    *, k_steps, max_windows, interpret, nb, bend, step, n_tiles, precision,
):
    kernel = functools.partial(
        _bwd_kernel,
        max_windows=max_windows,
        k_steps=k_steps,
        nb=nb,
        bend=bend,
        step=step,
        precision=precision,
    )
    n = n_tiles * R
    rows = n // RL
    state_spec = pl.BlockSpec((RS, RL), lambda t: (t, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    f32s = jax.ShapeDtypeStruct((rows, RL), jnp.float32)
    i32s = jax.ShapeDtypeStruct((rows, RL), jnp.int32)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[any_spec, any_spec, *[state_spec] * 13],
        out_specs=[any_spec, *[state_spec] * 10],
        out_shape=[
            jax.ShapeDtypeStruct(gzeros.shape, jnp.float32),
            *[f32s] * 9,
            i32s,
        ],
        scratch_shapes=[
            pltpu.VMEM((RS, TCH, PVP), jnp.float32),
            pltpu.VMEM((RS, RCH, PVP), jnp.float32),
            pltpu.VMEM((RS, GROWS, PVP), jnp.float32),
            pltpu.VMEM((1, GCH, PVP), jnp.float32),
            pltpu.SemaphoreType.DMA((RS,)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        # the adjoint retains more live window state than the forward (corner
        # caches + grad accumulators + one-hots); the default 16 MiB scoped
        # budget is exceeded while v5e has 128 MiB physical VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return call(
        table, gzeros, px, py, pz, vx, vy, vz, rrem, apx, apy, apz, avx, avy, avz
    )


def _overlap_add(w: jax.Array, axis: int, B: int) -> jax.Array:
    """(…, N, B+1, …) → (…, N·B+1, …): overlap-add out[n·B+j] += w[n, j],
    the exact adjoint of ``march_pallas._overlap_windows`` — built DENSELY:
    the main body is a reshape of w[…, :B] and the +1 halo plane is the same
    values shifted by B and added, no scatter (XLA TPU scatters with
    duplicated indices serialize)."""
    N = w.shape[axis]
    main = jax.lax.slice_in_dim(w, 0, B, axis=axis + 1)
    shp = list(w.shape)
    shp[axis : axis + 2] = [N * B]
    main = main.reshape(shp)  # (…, N·B, …)
    pad = [(0, 0)] * main.ndim
    pad[axis] = (0, 1)
    main = jnp.pad(main, pad)  # (…, N·B+1, …)
    halo = jax.lax.slice_in_dim(w, B, B + 1, axis=axis + 1)  # (…, N, 1, …)
    pad2 = [(0, 0)] * w.ndim
    pad2[axis + 1] = (0, B - 1)
    halo = jnp.pad(halo, pad2).reshape(shp)  # value n at index n·B
    pad3 = [(0, 0)] * main.ndim
    pad3[axis] = (B, 0)
    halo = jax.lax.slice_in_dim(
        jnp.pad(halo, pad3), 0, N * B + 1, axis=axis
    )  # value n at index n·B + B
    return main + halo


def fold_brickmajor_grads(gtable: jax.Array, packed_shape, nb) -> jax.Array:
    """Brick-major point-grad table → gradient of the packed field.

    Inverse of ``build_brick_table``'s addressing: un-brick the (NB, GCH,
    PVP) point grads and overlap-add the +1 halo planes back onto the global
    points they replicate (each point is stored by up to 8 adjacent bricks).
    Fully dense (``_overlap_add`` — reshape + shifted add per axis); the old
    ``.at[idx].add`` scatter formulation serialized on TPU."""
    X, Y, Z, C = packed_shape
    nbx, nby, nbz = nb
    g = gtable[:, :NCH, :PV].reshape(nbx, nby, nbz, NCH, PX, PY, PZ)
    g = g.transpose(0, 4, 1, 5, 2, 6, 3)  # (nbx, PX, nby, PY, nbz, PZ, NCH)
    g = _overlap_add(g, 4, BZ)  # (nbx, PX, nby, PY, CZ+1, NCH)
    g = _overlap_add(g, 2, BY)  # (nbx, PX, CY+1, CZ+1, NCH)
    g = _overlap_add(g, 0, BX)  # (CX+1, CY+1, CZ+1, NCH)
    return g[:X, :Y, :Z]


def _bwd_impl(
    table, nb, end_pos, end_dir, nexec, d_pos, d_dir,
    *, bend, step, k_steps, max_windows, interpret, budget,
    precision=jax.lax.Precision.DEFAULT,
):
    """Run the adjoint kernel; returns (d_table_folded→packed via caller,
    d_pos0, d_dir0, recon_pos, windows_used).  ``nexec`` = executed steps."""
    n_bricks = int(table.shape[0])
    n_in = end_pos.shape[0]
    n = -(-n_in // R) * R
    pad = n - n_in

    pos = jnp.pad(end_pos.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        end_dir.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0
    )
    ap = jnp.pad(d_pos.astype(jnp.float32), ((0, pad), (0, 0)))
    av = jnp.pad(d_dir.astype(jnp.float32), ((0, pad), (0, 0)))
    nex = jnp.pad(nexec.astype(jnp.int32), (0, pad))

    # locality sort by the brick of the *end* position (the reverse march
    # starts there); mirrors the forward's one-time sort
    cells = jnp.asarray([c * b for c, b in zip(nb, (BX, BY, BZ))], jnp.int32)
    cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, cells - 1)
    b = cell // jnp.asarray([BX, BY, BZ], jnp.int32)
    brick = (b[:, 0] * nb[1] + b[:, 1]) * nb[2] + b[:, 2]
    brick = jnp.where(nex > 0, brick, DEAD_ID)
    order = jnp.argsort(brick)
    inv = jnp.argsort(order)
    pos, dirs, ap, av, nex = (
        pos[order], dirs[order], ap[order], av[order], nex[order]
    )

    if max_windows is None:
        max_windows = 2 * budget + 64

    rows = n // RL
    gzeros = jnp.zeros((n_bricks, GCH, PVP), jnp.float32)
    outs = _bwd_call(
        table, gzeros,
        pos[:, 0].reshape(rows, RL), pos[:, 1].reshape(rows, RL),
        pos[:, 2].reshape(rows, RL),
        dirs[:, 0].reshape(rows, RL), dirs[:, 1].reshape(rows, RL),
        dirs[:, 2].reshape(rows, RL),
        nex.reshape(rows, RL),
        ap[:, 0].reshape(rows, RL), ap[:, 1].reshape(rows, RL),
        ap[:, 2].reshape(rows, RL),
        av[:, 0].reshape(rows, RL), av[:, 1].reshape(rows, RL),
        av[:, 2].reshape(rows, RL),
        k_steps=k_steps, max_windows=int(max_windows), interpret=interpret,
        nb=nb, bend=bend, step=step, n_tiles=n // R, precision=precision,
    )
    gtable = outs[0]
    windows_used = outs[10][:: R // RL, 0]
    tiles = [o.reshape(n)[inv][:n_in] for o in outs[1:10]]
    d_pos0 = jnp.stack(tiles[0:3], axis=-1)
    d_dir0 = jnp.stack(tiles[3:6], axis=-1)
    recon_pos = jnp.stack(tiles[6:9], axis=-1)
    return gtable, d_pos0, d_dir0, recon_pos, windows_used


@functools.lru_cache(maxsize=32)
def _make_vjp_fn(budget, bend, step, min_bright, has_absorb, k_steps,
                 max_windows, interpret, layout="points", k_steps_bwd=None,
                 record_path=False):
    """custom_vjp'd (packed, pos, dirs, absorb) → TraceResult fields for
    fixed static march parameters (cached so repeated calls don't re-trace).

    ``absorb`` is always a float32 array (dummy zeros when has_absorb is
    False) so every primal input has a float cotangent; its gradient is zero
    (absorption affects brightness and termination only — both
    straight-through).

    ``layout`` selects the brick-table layout and kernel pair: "points"
    (march_pallas/march_bwd) or "lines" (march_lines — the faster table
    build/fold and single-M-tile gather, see kernels/line_table.py)."""

    if layout == "lines":
        from .march_lines import (
            _bwd_impl_lines as bwd_impl_fn,
            march_lines as march_fn,
        )
        from .line_table import line_brick_grid as grid_fn

        if interpret:
            from .line_table import (
                build_line_table as build_fn,
                fold_line_grads as fold_fn,
            )
        else:
            # Pallas build/fold kernels (line_table_pallas): the XLA
            # versions' per-brick transposes cost 53 + 46 ms per 256³ step
            # vs 33 + 36 ms for the explicit kernels (probe_r5_table,
            # bit-exact build / 1.5e-7 fold parity on chip)
            from .line_table_pallas import (
                build_line_table_pallas as build_fn,
                fold_line_grads_pallas as fold_fn,
            )
    else:
        from .march_pallas import brick_grid as grid_fn

        build_fn = build_brick_table
        march_fn = march_pallas
        bwd_impl_fn = _bwd_impl
        fold_fn = fold_brickmajor_grads

    assert not (record_path and layout != "lines"), \
        "record_path requires layout='lines'"

    def fwd_impl(packed, pos, dirs, absorb):
        # build the brick table ONCE and thread it through to the backward as
        # a residual — the reverse replay reads the same table, and the
        # build's relayout transposes dominate the whole train step at 256³
        # if repeated
        table, nb = build_fn(
            packed, absorb=absorb if has_absorb else None
        )
        kw = {}
        if record_path:
            # raw (device-array) form: unscrambled by march_pallas_diff on
            # the host — trace_path composes with the differentiable path
            # (VERDICT r4 item 9; ≙ cuda_volume_raytracer.cu:333,348-358)
            kw = dict(record_path=True, unscramble=False)
        res, raw = march_fn(
            packed, pos, dirs, budget,
            bend_scale=np.asarray(bend, np.float32),
            step_scale=np.asarray(step, np.float32),
            absorb=absorb if has_absorb else None,
            minimum_brightness=min_bright,
            k_steps=k_steps, interpret=interpret, return_state=True,
            table=table, nb=nb, **kw,
        )
        return res, raw, table

    def _outs(res):
        out = (res.end_position, res.end_direction, res.end_iteration,
               res.remaining_light, res.windows_used)
        if record_path:
            out = out + (res.path,)  # PathRecording pytree (stop-gradient)
        return out

    @jax.custom_vjp
    def f(packed, pos, dirs, absorb):
        res, _, _ = fwd_impl(packed, pos, dirs, absorb)
        return _outs(res)

    def f_fwd(packed, pos, dirs, absorb):
        res, raw, table = fwd_impl(packed, pos, dirs, absorb)
        # executed steps from the RAW remaining counter (budget-1 − rem):
        # correct even for rays still alive at the forward's max_windows cap,
        # where end_iteration would claim the whole budget
        nexec = jnp.maximum(jnp.int32(budget - 1) - raw["remaining"], 0)
        return _outs(res), (packed, absorb, table, res.end_position,
                            res.end_direction, nexec)

    def f_bwd(residuals, cot):
        packed, absorb, table, end_pos, end_dir, nexec = residuals
        d_pos, d_dir = cot[0], cot[1]  # int outputs carry no cotangent
        nb = grid_fn(packed.shape)
        gtable, d_pos0, d_dir0, _, windows_used = bwd_impl_fn(
            table, nb, end_pos, end_dir, nexec, d_pos, d_dir,
            bend=bend, step=step,
            k_steps=k_steps if k_steps_bwd is None else k_steps_bwd,
            max_windows=max_windows, interpret=interpret, budget=budget,
        )
        d_packed = fold_fn(gtable, packed.shape, nb)
        # Truncation is an ERROR, not a diagnostic: a tile that exited the
        # replay with residual reverse budget (sign-encoded by the kernel as
        # windows_used < 0) left partially propagated adjoints.  Poison every
        # gradient with NaN so the failure is loud (optimizers diverge,
        # jax_debug_nans trips) instead of silently wrong — raising is
        # impossible on traced values inside custom_vjp.  (A window-count
        # heuristic would false-positive on tiles that legitimately finish
        # in exactly max_windows windows.)
        truncated = jnp.any(windows_used < 0)
        poison = jnp.where(truncated, jnp.float32(jnp.nan), jnp.float32(1.0))
        return (
            d_packed * poison,
            d_pos0 * poison,
            d_dir0 * poison,
            jnp.zeros_like(absorb),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def march_pallas_diff(
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    translucency: Optional[jax.Array] = None,
    minimum_brightness: int = 0,
    k_steps: int = 16,
    max_windows: Optional[int] = None,
    interpret: bool = False,
    layout: str = "points",
    k_steps_bwd: Optional[int] = None,
    record_path: bool = False,
) -> TraceResult:
    """Differentiable Pallas march: a TraceResult whose ``end_position`` and
    ``end_direction`` carry gradients to ``packed``, ``start_position`` and
    ``start_direction`` via the reverse-replay adjoint kernel.

    Forward semantics = ``march_pallas`` (float C++ oracle,
    /root/reference/src/cuda_volume_raytracer.cu:335-349) including
    absorption; ``translucency``/``minimum_brightness`` influence only the
    non-differentiable outputs and termination (straight-through).
    ``layout``: "points" or "lines" (see ``_make_vjp_fn``).
    ``k_steps_bwd``: window step count for the adjoint kernel when it
    should differ from the forward's (the forward's 2x anchor prefers a
    longer k than the 1-cell adjoint — benchmarks/perf_notes.md).
    """
    bend = tuple(
        float(v) for v in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,))
    )
    step = tuple(
        float(v) for v in np.broadcast_to(np.asarray(step_scale, np.float32), (3,))
    )
    has_absorb = translucency is not None
    absorb = (
        absorption_fraction(translucency)
        if has_absorb
        else jnp.zeros((1, 1, 1), jnp.float32)
    )
    f = _make_vjp_fn(
        int(budget), bend, step, int(minimum_brightness), has_absorb,
        int(k_steps), max_windows if max_windows is None else int(max_windows),
        bool(interpret), str(layout),
        None if k_steps_bwd is None else int(k_steps_bwd),
        bool(record_path),
    )
    outs = f(packed, start_position, start_direction, absorb)
    end_pos, end_dir, end_iter, light, windows = outs[:5]
    path = None
    if record_path:
        # host-side unscramble of the raw snapshots (the reference's
        # trace_path contract) — eager calls only; under a jit/grad trace
        # the raw PathRecording pytree is returned instead (the caller can
        # ``unscramble_path`` it outside the trace)
        from .march_lines import unscramble_path

        if _trace_is_eager():
            path = unscramble_path(
                outs[5], int(budget), int(start_position.shape[0])
            )
        else:
            path = outs[5]
    return TraceResult(
        end_position=end_pos,
        end_direction=end_dir,
        end_iteration=end_iter,
        remaining_light=light,
        path=path,
        windows_used=windows,
    )
