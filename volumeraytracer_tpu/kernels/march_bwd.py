"""Pallas TPU backward march — reverse-replay adjoint kernel + custom_vjp.

The reference has **no backward pass at all** (SURVEY.md §0: differentiability
is a new requirement); this kernel supplies the gradient path for the
brick-walking forward kernel (``march_pallas``) at kernel speed instead of
the XLA scan-remat fallback (``ops.march.march_float(differentiable=True)``).

Key idea — the eikonal step is an *exactly invertible* integrator
(/root/reference/src/cuda_volume_raytracer.cu:344-347 in float semantics):

    forward:   u = v + bend ⊙ g(x);        x' = x + step ⊙ u / |u|²
    reverse:   x = x' − step ⊙ u / |u|²;   v = u − bend ⊙ g(x)

so the backward pass needs **no saved trajectory**: starting from the end
state (pos, dir) it re-marches *backwards*, reconstructing every executed
step (the executed-step count per ray is the only residual), and pushes the
adjoints along:

    ū_j  = v̄'_j + step_j·ilen·x̄'_j − 2 u_j ilen² Σ_i step_i u_i x̄'_i
    x̄_j  = x̄'_j + [∂g/∂x]ᵀ(bend ⊙ ū)            (trilinear weight Jacobian)
    v̄    = ū
    C̄oc += w_o · bend_c · ū_c                     (field corner gradients)

Field gradients use the **transpose of the forward's one-hot MXU gather**:
per refresh window the per-ray corner-gradient accumulator (R, 32) is
scattered into the brick rows with ``onehotᵀ @ d_cache`` — gather-by-matmul
and scatter-by-matmul are the same systolic-array trick. Brick gradients
accumulate in a VMEM buffer and are flushed to a brick-major HBM table by
read-modify-write DMA whenever the in-kernel scheduler switches bricks
(sequential TPU grid ⇒ no races); the table arrives as an aliased zeros
input (``input_output_aliases``).

The opaque-surface termination (interp channel 3, .cu:343) is treated as
non-differentiable (straight-through): executed-step counts are constants of
the backward pass, and the opacity channel receives zero gradient — the
soft-termination relaxation lives in the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import TraceResult
from .march_pallas import (
    BR,
    BV,
    BX,
    BY,
    BZ,
    CH,
    DEAD_ID,
    R,
    RL,
    RS,
    build_corner_table,
    march_pallas,
)


def _bwd_kernel(
    # inputs
    table_ref,  # (Xc, Yc, Zc//4, 128) f32 ANY/HBM — forward corner table
    gin_ref,  # (NB*BR, 128) f32 ANY/HBM — zeros, aliased to gout_ref
    px_ref, py_ref, pz_ref,  # end positions (R,) tiles
    vx_ref, vy_ref, vz_ref,  # end directions
    nexec_ref,  # (R,) i32 executed-step counts
    apx_ref, apy_ref, apz_ref,  # cotangent of end position
    avx_ref, avy_ref, avz_ref,  # cotangent of end direction
    # outputs
    gout_ref,  # (NB*BR, 128) f32 ANY/HBM — brick-major corner-grad table
    oax_ref, oay_ref, oaz_ref,  # d start position
    obx_ref, oby_ref, obz_ref,  # d start (working) direction
    # scratch
    brick_ref,  # (BX, BY, BZ//4, 128) f32
    cache_ref,  # (32, RS, RL) f32 corner cache
    dacc_ref,  # (R, 32) f32 per-window corner-grad rows
    gbrick_ref,  # (BR, 128) f32 brick-grad accumulator
    tmp_ref,  # (BR, 128) f32 RMW staging
    dma_sem, g_sem,
    *,
    max_windows: int,
    k_steps: int,
    nb: Tuple[int, int, int],
    bend: Tuple[float, float, float],
    step: Tuple[float, float, float],
):
    shape = (RS, RL)
    ex, ey, ez = (jnp.float32(b) for b in bend)
    sx, sy, sz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)

    gbrick_ref[:] = jnp.zeros((BR, RL), jnp.float32)

    state0 = (
        px_ref[:], py_ref[:], pz_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:],
        apx_ref[:], apy_ref[:], apz_ref[:],
        avx_ref[:], avy_ref[:], avz_ref[:],
        nexec_ref[:],
    )

    def _flush(brick_id):
        """RMW-accumulate gbrick into the brick-major HBM grad table."""
        rd = pltpu.make_async_copy(
            gout_ref.at[pl.ds(brick_id * BR, BR), :], tmp_ref, g_sem
        )
        rd.start()
        rd.wait()
        tmp_ref[:] = tmp_ref[:] + gbrick_ref[:]
        wr = pltpu.make_async_copy(
            tmp_ref, gout_ref.at[pl.ds(brick_id * BR, BR), :], g_sem
        )
        wr.start()
        wr.wait()
        gbrick_ref[:] = jnp.zeros((BR, RL), jnp.float32)

    def cond(carry):
        w, prev_id, state = carry
        return (w < max_windows) & jnp.any(state[12] > 0)

    def window_body(carry):
        w, prev_id, state = carry
        px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem = state
        live = rrem > 0

        # reverse candidate x_k = x_{k+1} − step ⊙ v / |v|² anchors the window
        ilen0 = 1.0 / (vx * vx + vy * vy + vz * vz)
        cx = px - vx * sx * ilen0
        cy = py - vy * sy * ilen0
        cz = pz - vz * sz * ilen0
        bxi = jnp.floor(cx).astype(jnp.int32)
        byi = jnp.floor(cy).astype(jnp.int32)
        bzi = jnp.floor(cz).astype(jnp.int32)
        cbx = jnp.clip(bxi // BX, 0, nbx - 1)
        cby = jnp.clip(byi // BY, 0, nby - 1)
        cbz = jnp.clip(bzi // BZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(live, ids, DEAD_ID)
        cur = jnp.min(ids)

        @pl.when(cur != prev_id)
        def _():
            @pl.when(prev_id >= 0)
            def _():
                _flush(prev_id)

            b2 = cur // nbz
            ox = (b2 // nby) * BX
            oy = (b2 % nby) * BY
            ozr = (cur % nbz) * (BZ // 4)
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(ox, BX), pl.ds(oy, BY), pl.ds(ozr, BZ // 4), :],
                brick_ref,
                dma_sem,
            )
            cp.start()
            cp.wait()

        brick_flat = brick_ref[:].reshape(BR, RL)
        rhs = [brick_flat[:, 32 * q : 32 * (q + 1)] for q in range(4)]
        in_cur = live & (ids == cur)

        b2 = cur // nbz
        oxi = (b2 // nby) * BX
        oyi = (b2 % nby) * BY
        ozi = (cur % nbz) * BZ
        lx = jnp.clip(bxi - oxi, 0, BX - 1)
        ly = jnp.clip(byi - oyi, 0, BY - 1)
        lz = jnp.clip(bzi - ozi, 0, BZ - 1)
        row = (lx * BY + ly) * (BZ // 4) + (lz >> 2)
        quarter = lz & 3

        # ---- refresh the 32-channel per-ray corner cache (one-hot gather,
        # identical to the forward kernel) ----
        row_t = row.T
        q_t = quarter.T
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (RL, RL), 1)
        onehots = []  # kept for the transpose-scatter below
        acc = jnp.zeros((R, 32), jnp.float32)
        for chunk in range(BR // RL):
            rowmatch = [
                row_t[:, s : s + 1] == lane_ids + chunk * RL for s in range(RS)
            ]
            per_q = []
            for q in range(4):
                onehot = jnp.concatenate(
                    [
                        (rowmatch[s] & (q_t[:, s : s + 1] == q)).astype(jnp.float32)
                        for s in range(RS)
                    ],
                    axis=0,
                )  # (R, RL)
                per_q.append(onehot)
                acc = acc + jax.lax.dot_general(
                    onehot,
                    rhs[q][chunk * RL : (chunk + 1) * RL, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            onehots.append(per_q)
        for s in range(RS):
            cache_ref[:, s, :] = acc[s * RL : (s + 1) * RL, :].T
        cache = [cache_ref[oc] for oc in range(32)]

        basex = jnp.floor(cx)
        basey = jnp.floor(cy)
        basez = jnp.floor(cz)

        zero = jnp.zeros(shape, jnp.float32)
        dC0 = [zero for _ in range(8)]  # corner grads, channel 0 (x-bend)
        dC1 = [zero for _ in range(8)]
        dC2 = [zero for _ in range(8)]

        def step_body(k, carry):
            (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem,
             dC0, dC1, dC2) = carry
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
            ok = in_cur & (rrem > 0) & ~crossed

            gx_ = 1.0 - fx
            gy_ = 1.0 - fy
            gz_ = 1.0 - fz
            # corner weights + their frac-derivatives, product((0,1)^3) order
            w = (
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
                g0 = g0 + w[o] * cache[o * CH + 0]
                g1 = g1 + w[o] * cache[o * CH + 1]
                g2 = g2 + w[o] * cache[o * CH + 2]

            # reconstruct v_k
            nvx = vx - g0 * ex
            nvy = vy - g1 * ey
            nvz = vz - g2 * ez

            # adjoints
            t = sx * vx * ax + sy * vy * ay + sz * vz * az
            il2 = ilen * ilen
            ubx = bx + sx * ilen * ax - 2.0 * vx * il2 * t
            uby = by + sy * ilen * ay - 2.0 * vy * il2 * t
            ubz = bz + sz * ilen * az - 2.0 * vz * il2 * t
            h0 = ex * ubx
            h1 = ey * uby
            h2 = ez * ubz

            Gx = zero
            Gy = zero
            Gz = zero
            okf = jnp.where(ok, 1.0, 0.0)
            for o in range(8):
                m = (
                    cache[o * CH + 0] * h0
                    + cache[o * CH + 1] * h1
                    + cache[o * CH + 2] * h2
                )
                Gx = Gx + dwx[o] * m
                Gy = Gy + dwy[o] * m
                Gz = Gz + dwz[o] * m
                wok = w[o] * okf
                dC0[o] = dC0[o] + wok * h0
                dC1[o] = dC1[o] + wok * h1
                dC2[o] = dC2[o] + wok * h2

            nax = ax + Gx
            nay = ay + Gy
            naz = az + Gz

            px = jnp.where(ok, candx, px)
            py = jnp.where(ok, candy, py)
            pz = jnp.where(ok, candz, pz)
            vx = jnp.where(ok, nvx, vx)
            vy = jnp.where(ok, nvy, vy)
            vz = jnp.where(ok, nvz, vz)
            ax = jnp.where(ok, nax, ax)
            ay = jnp.where(ok, nay, ay)
            az = jnp.where(ok, naz, az)
            bx = jnp.where(ok, ubx, bx)
            by = jnp.where(ok, uby, by)
            bz = jnp.where(ok, ubz, bz)
            rrem = jnp.where(ok, rrem - 1, rrem)
            return (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem,
                    dC0, dC1, dC2)

        out = jax.lax.fori_loop(
            0, k_steps, step_body,
            (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem,
             list(dC0), list(dC1), list(dC2)),
        )
        state = out[:13]
        dC0, dC1, dC2 = out[13], out[14], out[15]

        # ---- transpose-scatter: d_cache rows → brick-grad accumulator ----
        for o in range(8):
            cache_ref[o * CH + 0] = dC0[o]
            cache_ref[o * CH + 1] = dC1[o]
            cache_ref[o * CH + 2] = dC2[o]
            cache_ref[o * CH + 3] = zero  # opacity: straight-through
        for s in range(RS):
            dacc_ref[pl.ds(s * RL, RL), :] = cache_ref[:, s, :].T  # (RL, 32)
        dacc = dacc_ref[:]
        for chunk in range(BR // RL):
            contrib = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        onehots[chunk][q],  # (R, RL)
                        dacc,  # (R, 32)
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    for q in range(4)
                ],
                axis=1,
            )  # (RL, 128): quarters side by side, matching the row layout
            gbrick_ref[pl.ds(chunk * RL, RL), :] = (
                gbrick_ref[pl.ds(chunk * RL, RL), :] + contrib
            )

        return w + 1, cur, tuple(state)

    w_fin, last_id, state = jax.lax.while_loop(
        cond, window_body, (jnp.int32(0), jnp.int32(-1), state0)
    )

    @pl.when(last_id >= 0)
    def _():
        _flush(last_id)

    (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem) = state
    oax_ref[:] = ax
    oay_ref[:] = ay
    oaz_ref[:] = az
    obx_ref[:] = bx
    oby_ref[:] = by
    obz_ref[:] = bz


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_steps", "max_windows", "interpret", "nb", "bend", "step", "n_tiles",
    ),
)
def _bwd_call(
    table, gzeros, px, py, pz, vx, vy, vz, nexec, apx, apy, apz, avx, avy, avz,
    *, k_steps, max_windows, interpret, nb, bend, step, n_tiles,
):
    kernel = functools.partial(
        _bwd_kernel,
        max_windows=max_windows,
        k_steps=k_steps,
        nb=nb,
        bend=bend,
        step=step,
    )
    n = n_tiles * R
    rows = n // RL
    state_spec = pl.BlockSpec((RS, RL), lambda t: (t, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct(gzeros.shape, jnp.float32),
        *[jax.ShapeDtypeStruct((rows, RL), jnp.float32)] * 6,
    ]
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[any_spec, any_spec, *[state_spec] * 13],
        out_specs=[any_spec, *[state_spec] * 6],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BX, BY, BZ // 4, RL), jnp.float32),
            pltpu.VMEM((32, RS, RL), jnp.float32),
            pltpu.VMEM((R, 32), jnp.float32),
            pltpu.VMEM((BR, RL), jnp.float32),
            pltpu.VMEM((BR, RL), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )
    return call(
        table, gzeros, px, py, pz, vx, vy, vz, nexec, apx, apy, apz, avx, avy, avz
    )


def fold_brickmajor_grads(gflat: jax.Array, packed_shape, nb) -> jax.Array:
    """Brick-major corner-grad table → gradient of the packed field.

    Inverse of ``build_corner_table``: un-brick, un-pack the 4-cells-per-row
    lanes, and sum each cell's 8 corner-duplicated slots back onto the voxels
    they duplicate (pure XLA slice-adds; cheap one-time reduction).
    """
    X, Y, Z, C = packed_shape
    cx, cy, cz = X - 1, Y - 1, Z - 1
    nbx, nby, nbz = nb
    # (NB*BR, 128) → (nbx, nby, nbz, BX, BY, BZ//4, 128) → spatial rows
    g = gflat.reshape(nbx, nby, nbz, BX, BY, BZ // 4, 128)
    g = g.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        nbx * BX, nby * BY, nbz * (BZ // 4), 128
    )
    g = g.reshape(nbx * BX, nby * BY, nbz * BZ, 32)[:cx, :cy, :cz]
    d_packed = jnp.zeros(packed_shape, jnp.float32)
    o = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                d_packed = d_packed.at[dx : dx + cx, dy : dy + cy, dz : dz + cz].add(
                    g[..., o * 4 : (o + 1) * 4]
                )
                o += 1
    return d_packed


def _table_to_brickmajor(table: jax.Array, nb) -> jax.Array:
    """Spatial corner table → brick-major (NB*BR, 128) layout (for tests)."""
    nbx, nby, nbz = nb
    t = table.reshape(nbx, BX, nby, BY, nbz, BZ // 4, 128)
    return t.transpose(0, 2, 4, 1, 3, 5, 6).reshape(nbx * nby * nbz * BR, 128)


@functools.lru_cache(maxsize=32)
def _make_vjp_fn(budget, bend, step, k_steps, max_windows, interpret):
    """custom_vjp'd (packed, pos, dirs) → (end_pos, end_dir) for fixed
    static march parameters (cached so repeated calls don't re-trace)."""

    def fwd_impl(packed, pos, dirs):
        res = march_pallas(
            packed, pos, dirs, budget,
            bend_scale=np.asarray(bend, np.float32),
            step_scale=np.asarray(step, np.float32),
            k_steps=k_steps, interpret=interpret,
        )
        return res.end_position, res.end_direction, res.end_iteration

    @jax.custom_vjp
    def f(packed, pos, dirs):
        end_pos, end_dir, _ = fwd_impl(packed, pos, dirs)
        return end_pos, end_dir

    def f_fwd(packed, pos, dirs):
        end_pos, end_dir, end_iter = fwd_impl(packed, pos, dirs)
        # executed steps: rem starts at budget−1 and decrements per executed
        # step; end_iteration = budget − end_remaining ⇒ nexec = end_iter − 1
        # (see march_pallas budget accounting / .cu:333,350-352)
        nexec = jnp.maximum(end_iter.astype(jnp.int32) - 1, 0)
        return (end_pos, end_dir), (packed, end_pos, end_dir, nexec)

    def f_bwd(residuals, cot):
        packed, end_pos, end_dir, nexec = residuals
        d_pos, d_dir = cot
        d_packed, d_pos0, d_dir0 = _bwd_impl(
            packed, end_pos, end_dir, nexec, d_pos, d_dir,
            bend=bend, step=step, k_steps=k_steps,
            max_windows=max_windows, interpret=interpret, budget=budget,
        )
        return d_packed, d_pos0, d_dir0

    f.defvjp(f_fwd, f_bwd)
    return f


def _bwd_impl(
    packed, end_pos, end_dir, nexec, d_pos, d_dir,
    *, bend, step, k_steps, max_windows, interpret, budget,
):
    table = build_corner_table(packed)
    nb = (
        int(table.shape[0]) // BX,
        int(table.shape[1]) // BY,
        int(table.shape[2]) * 4 // BZ,
    )
    n_bricks = nb[0] * nb[1] * nb[2]
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
        max_windows = 2 * -(-budget // max(1, k_steps)) + 8 * n_bricks + 64

    rows = n // RL
    gzeros = jnp.zeros((n_bricks * BR, RL), jnp.float32)
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
        nb=nb, bend=bend, step=step, n_tiles=n // R,
    )
    gflat = outs[0]
    tiles = [o.reshape(n)[inv][:n_in] for o in outs[1:]]
    d_pos0 = jnp.stack(tiles[0:3], axis=-1)
    d_dir0 = jnp.stack(tiles[3:6], axis=-1)
    d_packed = fold_brickmajor_grads(gflat, packed.shape, nb)
    return d_packed, d_pos0, d_dir0


def march_pallas_diff(
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    k_steps: int = 8,
    max_windows=None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable Pallas march: returns (end_position, end_direction)
    with gradients flowing to ``packed``, ``start_position`` and
    ``start_direction`` via the reverse-replay adjoint kernel.

    Forward semantics = ``march_pallas`` (float C++ oracle,
    /root/reference/src/cuda_volume_raytracer.cu:335-349, no translucency).
    """
    bend = tuple(
        float(v) for v in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,))
    )
    step = tuple(
        float(v) for v in np.broadcast_to(np.asarray(step_scale, np.float32), (3,))
    )
    f = _make_vjp_fn(int(budget), bend, step, int(k_steps),
                     max_windows if max_windows is None else int(max_windows),
                     bool(interpret))
    return f(packed, start_position, start_direction)
