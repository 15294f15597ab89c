"""Pallas TPU forward march kernel — brick-walking, MXU one-hot gather.

TPU-first re-design of the reference hot loop (``trace_ray_function``,
/root/reference/src/cuda_volume_raytracer.cu:317-374) around the three TPU
constraints SURVEY.md §7 calls out:

  * **gather-hostile memory**: the per-step 8-corner read becomes
    (a) a *corner-duplicated* field table (each cell's row holds all
    8 corners × 4 channels — the VMEM analogue of the CUDA texture's
    cached neighbourhood loads, .cu:130-155),
    (b) a **brick** of 8×8×16 cells (128 KB) DMA'd HBM→VMEM on demand,
    (c) a per-ray **corner cache** refreshed every K steps by a one-hot
    MXU matmul over the brick (gather-by-matmul: the only fast dynamic
    addressing on this hardware generation — ``tpu.dynamic_gather`` along
    sublanes is not available on the target libtpu),
  * **ray divergence**: lanes are predicated; a lane that leaves its 2×2×2
    cell *stalls* until the next refresh (≤ K-1 steps); each refresh window
    the kernel marches the lanes of the *minimum* live brick id and DMAs a
    new brick only when that id changes — an in-kernel scheduler replacing
    the reference's per-ray ``break`` divergence,
  * **dispatch overhead**: the ENTIRE march (up to the full iteration
    budget) runs in ONE pallas_call; the driver only sorts rays once by
    brick id for locality (the TPU equivalent of the reference's
    0x8000-ray chunk scheduler, .cu:798-946).

Layouts: ray state lives as (8, 128) tiles (R = 1024 rays per grid program);
all per-step math is full-width VPU work.  The only relayouts are one
transpose pair per refresh (cell indices to row-major for the one-hot, the
gathered (1024, 32) cache back to 32 × (8, 128) channel tiles).
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

# rays per grid program: one (sublane, lane) tile set
RS, RL = 8, 128
R = RS * RL
# brick extent in cells; 8*8*16 = 1024 cells = 256 table rows (4 z-cells/row)
BX, BY, BZ = 8, 8, 16
BV = BX * BY * BZ
BR = BV // 4  # brick table rows (128 lanes each)
CH = 4  # dim + 1 field channels (3D)
DEAD_ID = 0x7FFFFFFF  # plain int: jnp constants may not be captured by kernels


def build_corner_table(packed: jax.Array) -> jax.Array:
    """Corner-duplicated cell table, padded to brick multiples and packed
    four z-cells per 128-lane row (HBM DMA slices must be lane-aligned).

    packed: (X, Y, Z, 4) float32 (the preprocessed diff field).
    Returns (Xc, Yc, Zc//4, 128) with Xc/Yc mult. of 8, Zc mult. of 16:
    lane ``(z % 4) * 32 + o*4 + c`` of row ``(x, y, z//4)`` holds
    ``packed[x+dx(o), y+dy(o), z+dz(o), c]`` for corner o with bits
    (dx, dy, dz) in itertools.product order (matching
    ops.interp._weights_product).  Cells outside the valid grid are zero;
    rays never evaluate them (global bounds predication).
    """
    X, Y, Z, C = packed.shape
    assert C == CH
    cx, cy, cz = X - 1, Y - 1, Z - 1  # valid cells per axis
    corners = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corners.append(packed[dx : dx + cx, dy : dy + cy, dz : dz + cz, :])
    table = jnp.concatenate(corners, axis=-1)  # (cx, cy, cz, 32)
    Xc = -(-cx // BX) * BX
    Yc = -(-cy // BY) * BY
    Zc = -(-cz // BZ) * BZ
    table = jnp.pad(table, ((0, Xc - cx), (0, Yc - cy), (0, Zc - cz), (0, 0)))
    return table.reshape(Xc, Yc, Zc // 4, 128)


def _march_kernel(
    # inputs
    table_ref,  # (Xc, Yc, Zc, 32) f32 in ANY/HBM
    px_ref, py_ref, pz_ref,  # (R,) f32 blocks
    dx_ref, dy_ref, dz_ref,  # (R,) f32 blocks
    rem_ref, alive_ref,  # (R,) i32 blocks
    # outputs
    opx_ref, opy_ref, opz_ref, odx_ref, ody_ref, odz_ref, orem_ref, oalive_ref,
    # scratch
    brick_ref,  # (BX, BY, BZ//4, 128) f32
    cache_ref,  # (32, RS, RL) f32 — per-ray corner cache, one slot per chan
    dma_sem,
    *,
    max_windows: int,
    k_steps: int,
    bounds: Tuple[int, int, int],
    nb: Tuple[int, int, int],  # brick-grid extents
    bend: Tuple[float, float, float],
    step: Tuple[float, float, float],
):
    shape = (RS, RL)
    xb = jnp.float32(bounds[0] - 1)
    yb = jnp.float32(bounds[1] - 1)
    zb = jnp.float32(bounds[2] - 1)
    bendx, bendy, bendz = (jnp.float32(b) for b in bend)
    stepx, stepy, stepz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)

    state0 = (
        px_ref[:], py_ref[:], pz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        rem_ref[:],
        alive_ref[:],  # i32 mask: bool select_n is unsupported
    )

    def cond(carry):
        w, prev_id, state = carry
        return (w < max_windows) & jnp.any(state[7] != 0)

    def window_body(carry):
        w, prev_id, state = carry
        px, py, pz, dx, dy, dz, rem, alive = state

        # ---- per-lane brick id; current brick = min over live lanes ----
        cbx = jnp.clip(jnp.floor(px).astype(jnp.int32) // BX, 0, nbx - 1)
        cby = jnp.clip(jnp.floor(py).astype(jnp.int32) // BY, 0, nby - 1)
        cbz = jnp.clip(jnp.floor(pz).astype(jnp.int32) // BZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(alive != 0, ids, DEAD_ID)
        cur = jnp.min(ids)

        @pl.when(cur != prev_id)
        def _():
            b2 = cur // nbz
            ox = (b2 // nby) * BX
            oy = (b2 % nby) * BY
            ozr = (cur % nbz) * (BZ // 4)  # row units: 4 z-cells per row
            cp = pltpu.make_async_copy(
                table_ref.at[pl.ds(ox, BX), pl.ds(oy, BY), pl.ds(ozr, BZ // 4), :],
                brick_ref,
                dma_sem,
            )
            cp.start()
            cp.wait()

        # (BX, BY, BZ//4, 128) → (BR, 128); static lane slices per z-quarter
        brick_flat = brick_ref[:].reshape(BR, RL)
        rhs = [brick_flat[:, 32 * q : 32 * (q + 1)] for q in range(4)]
        in_cur = (alive != 0) & (ids == cur)

        # local cell coords inside the current brick
        b2 = cur // nbz
        oxf = ((b2 // nby) * BX).astype(jnp.float32)
        oyf = ((b2 % nby) * BY).astype(jnp.float32)
        ozf = ((cur % nbz) * BZ).astype(jnp.float32)
        lx = jnp.clip((jnp.floor(px) - oxf).astype(jnp.int32), 0, BX - 1)
        ly = jnp.clip((jnp.floor(py) - oyf).astype(jnp.int32), 0, BY - 1)
        lz = jnp.clip((jnp.floor(pz) - ozf).astype(jnp.int32), 0, BZ - 1)
        row = (lx * BY + ly) * (BZ // 4) + (lz >> 2)  # (8,128) in [0, BR)
        quarter = lz & 3

        # ---- refresh: one-hot MXU gather of the 32-channel corner rows ----
        # Mosaic cannot shape-cast (8,128)→(1024,1); assemble the row-major
        # one-hot from per-sublane-row transposes + a sublane concat instead.
        row_t = row.T  # (RL, RS) — 2D transpose is supported
        q_t = quarter.T
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (RL, RL), 1)
        acc = jnp.zeros((R, 32), jnp.float32)
        for chunk in range(BR // RL):
            rowmatch = [
                row_t[:, s : s + 1] == lane_ids + chunk * RL for s in range(RS)
            ]
            for q in range(4):
                onehot = jnp.concatenate(
                    [
                        (rowmatch[s] & (q_t[:, s : s + 1] == q)).astype(jnp.float32)
                        for s in range(RS)
                    ],
                    axis=0,
                )  # (R, RL): row s*RL+l = ray (sublane s, lane l)
                acc = acc + jax.lax.dot_general(
                    onehot,
                    rhs[q][chunk * RL : (chunk + 1) * RL, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        # acc row ordering: rows [s*RL + l] hold ray (sublane s, lane l)
        # of the (8,128) tiles.  Back to channel-tile layout via per-group
        # transposes, materialised into VMEM scratch so the inner step loop
        # reads clean (RS, RL) tiles instead of re-laying out concat chains
        # every step.
        for s in range(RS):
            cache_ref[:, s, :] = acc[s * RL : (s + 1) * RL, :].T  # (32, RL)
        cache = [cache_ref[oc] for oc in range(32)]  # 32 × (RS, RL) tiles

        # cell anchor for this refresh window
        basex = jnp.floor(px)
        basey = jnp.floor(py)
        basez = jnp.floor(pz)

        def step_body(k, carry):
            px, py, pz, dx, dy, dz, rem, alive = carry
            fx = px - basex
            fy = py - basey
            fz = pz - basez
            crossed = (
                (fx < 0) | (fx >= 1.0) | (fy < 0) | (fy >= 1.0) | (fz < 0) | (fz >= 1.0)
            )
            evaluable = in_cur & (alive != 0) & ~crossed

            gx = 1.0 - fx
            gy = 1.0 - fy
            gz = 1.0 - fz
            # corner weights in product((0,1),^3) order (x slowest)
            w = (
                gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
            )
            interp = [jnp.zeros(shape, jnp.float32) for _ in range(CH)]
            for o in range(8):
                for c in range(CH):
                    interp[c] = interp[c] + w[o] * cache[o * CH + c]

            inb = (
                (px >= 0) & (px < xb) & (py >= 0) & (py < yb) & (pz >= 0) & (pz < zb)
            )
            opaque = interp[3] > 0.0
            rem_ok = rem > 0
            ok = evaluable & inb & rem_ok & ~opaque
            # opaque termination needs a valid interp (evaluable lanes);
            # bounds/budget exhaustion kill a lane even while it is stalled
            # (the reference's loop condition runs before the interpolation,
            # cuda_volume_raytracer.cu:335).  Pure logical ops: select_n on
            # 1-bit vectors does not lower on this Mosaic version.
            alive_b = (evaluable & ok) | (
                ~evaluable & ((alive != 0) & inb & rem_ok)
            )
            alive = alive_b.astype(jnp.int32)

            ndx = dx + interp[0] * bendx
            ndy = dy + interp[1] * bendy
            ndz = dz + interp[2] * bendz
            ilen = 1.0 / (ndx * ndx + ndy * ndy + ndz * ndz)
            px = jnp.where(ok, px + ndx * stepx * ilen, px)
            py = jnp.where(ok, py + ndy * stepy * ilen, py)
            pz = jnp.where(ok, pz + ndz * stepz * ilen, pz)
            dx = jnp.where(ok, ndx, dx)
            dy = jnp.where(ok, ndy, dy)
            dz = jnp.where(ok, ndz, dz)
            rem = jnp.where(ok, rem - 1, rem)
            return px, py, pz, dx, dy, dz, rem, alive

        state = jax.lax.fori_loop(
            0, k_steps, step_body, (px, py, pz, dx, dy, dz, rem, alive)
        )
        return w + 1, cur, state

    _, _, state = jax.lax.while_loop(
        cond, window_body, (jnp.int32(0), jnp.int32(-1), state0)
    )
    px, py, pz, dx, dy, dz, rem, alive = state

    opx_ref[:] = px
    opy_ref[:] = py
    opz_ref[:] = pz
    odx_ref[:] = dx
    ody_ref[:] = dy
    odz_ref[:] = dz
    orem_ref[:] = rem
    oalive_ref[:] = alive


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "k_steps", "max_windows", "interpret",
        "bounds", "nb", "bend", "step", "n_tiles",
    ),
)
def _march_call(
    table, px, py, pz, dx, dy, dz, rem, alive,
    *, budget, k_steps, max_windows, interpret, bounds, nb, bend, step, n_tiles,
):
    kernel = functools.partial(
        _march_kernel,
        max_windows=max_windows,
        k_steps=k_steps,
        bounds=bounds,
        nb=nb,
        bend=bend,
        step=step,
    )
    n = n_tiles * R
    # state travels as (rows, 128) — the kernel sees native (8, 128) tiles
    # and never needs a cross-lane shape cast
    state_spec = pl.BlockSpec((RS, RL), lambda t: (t, 0))
    out_shape = [
        *[jax.ShapeDtypeStruct((n // RL, RL), jnp.float32)] * 6,
        jax.ShapeDtypeStruct((n // RL, RL), jnp.int32),
        jax.ShapeDtypeStruct((n // RL, RL), jnp.int32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # corner table stays in HBM
            *[state_spec] * 8,
        ],
        out_specs=[state_spec] * 8,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BX, BY, BZ // 4, RL), jnp.float32),
            pltpu.VMEM((32, RS, RL), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    return call(table, px, py, pz, dx, dy, dz, rem, alive)


def march_pallas(
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    k_steps: int = 8,
    max_windows: Optional[int] = None,
    interpret: bool = False,
    sort_rays: bool = True,
) -> TraceResult:
    """Forward float march through ``packed`` using the brick-walking kernel.

    Semantics identical to ``ops.march.march_float(..., opaque_when_positive=
    True, nearest=False)`` with no translucency (the brightness/absorption
    path falls back to the XLA march).  Positions in the packed-grid frame.
    """
    assert packed.ndim == 4 and packed.shape[-1] == CH, "3D packed field required"
    n_in, dim = start_position.shape
    assert dim == 3
    bounds = tuple(int(s) for s in packed.shape[:-1])
    bend = tuple(float(b) for b in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,)))
    step = tuple(float(s) for s in np.broadcast_to(np.asarray(step_scale, np.float32), (3,)))

    table = build_corner_table(packed)  # (Xc, Yc, Zc//4, 128)
    nb = (
        int(table.shape[0]) // BX,
        int(table.shape[1]) // BY,
        int(table.shape[2]) * 4 // BZ,
    )

    # pad ray count to a tile multiple
    n = -(-n_in // R) * R
    pad = n - n_in
    pos = jnp.pad(start_position.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        start_direction.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0
    )
    alive = jnp.concatenate(
        [jnp.ones((n_in,), jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    if sort_rays:
        # one locality sort: rays of the same brick land in the same tile
        cells = jnp.asarray([c * b for c, b in zip(nb, (BX, BY, BZ))], jnp.int32)
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, cells - 1)
        b = cell // jnp.asarray([BX, BY, BZ], jnp.int32)
        brick = (b[:, 0] * nb[1] + b[:, 1]) * nb[2] + b[:, 2]
        brick = jnp.where(alive != 0, brick, DEAD_ID)
        order = jnp.argsort(brick)
        inv = jnp.argsort(order)
        pos, dirs, alive = pos[order], dirs[order], alive[order]
    else:
        inv = None

    # budget-1: the reference consumes one slot for the start path entry
    # (cuda_volume_raytracer.cu:333; see ops.march.march_float)
    rem = jnp.full((n,), budget - 1, jnp.int32)
    if max_windows is None:
        # every window the min-brick group either steps or dies; generous cap
        max_windows = 2 * -(-budget // max(1, k_steps)) + 8 * int(np.prod(nb)) + 64

    rows = n // RL
    outs = _march_call(
        table,
        pos[:, 0].reshape(rows, RL), pos[:, 1].reshape(rows, RL),
        pos[:, 2].reshape(rows, RL),
        dirs[:, 0].reshape(rows, RL), dirs[:, 1].reshape(rows, RL),
        dirs[:, 2].reshape(rows, RL),
        rem.reshape(rows, RL), alive.reshape(rows, RL),
        budget=budget, k_steps=k_steps, max_windows=max_windows,
        interpret=interpret, bounds=bounds, nb=nb, bend=bend, step=step,
        n_tiles=n // R,
    )
    outs = [o.reshape(n) for o in outs]
    if inv is not None:
        outs = [o[inv] for o in outs]
    px, py, pz, dx, dy, dz, rem, alive = outs

    end_pos = jnp.stack([px, py, pz], axis=-1)[:n_in]
    end_dir = jnp.stack([dx, dy, dz], axis=-1)[:n_in]
    rem = rem[:n_in]
    alive = alive[:n_in]
    end_remaining = jnp.where(alive != 0, 0, rem).astype(jnp.uint32)
    end_iteration = jnp.uint32(budget) - end_remaining
    return TraceResult(
        end_position=end_pos,
        end_direction=end_dir,
        end_iteration=end_iteration,
        remaining_light=jnp.full((n_in,), 0xFFFFFFFF, jnp.uint32),
        path=None,
    )
