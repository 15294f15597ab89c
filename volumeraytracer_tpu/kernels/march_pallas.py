"""Pallas TPU forward march kernel — brick-resident one-hot MXU gather.

TPU-first re-design of the reference hot loop (``trace_ray_function``,
/root/reference/src/cuda_volume_raytracer.cu:317-374).  Round-2 rewrite built
from measured chip behaviour (benchmarks/probe_timing.py):

  * per-(8,128)-tile step math costs ~0.04 us — the VPU is nowhere near the
    bottleneck;
  * an (8×) per-sublane broadcast-compare one-hot + MXU ``dot_general`` gather
    of a whole 1024-cell brick costs ~0.6-1.5 us — cheap when amortised over
    a K-step refresh window;
  * the axon relay charges ~55 ms per *dispatch*, so the ENTIRE march (all
    windows, all DMAs) runs inside ONE ``pallas_call``.

Design (per grid program = one tile of R = 1024 rays in (8, 128) layout):

  1. The field is preprocessed into a **point-grid brick table**
     ``(NB, TCH=8, PVP=1408)`` (5 live channels + 3 zero rows so the
     per-brick HBM DMA slice is aligned to the f32 8-sublane tile):
     brick = 8×8×16 cells, stored as its
     9×9×17 POINT grid (cells + interpolation halo) — the VMEM analogue of
     the CUDA texture cache (.cu:130-155) *without* corner duplication
     (round-1's 8×-duplicated layout made the table build and gradient fold
     relayouts dominate the train step).
  2. An in-kernel **window scheduler** (while-loop): each of the 8 sublanes
     (128 rays) keeps its own resident brick in VMEM; per window, every
     sublane computes the *minimum* live brick id of its rays, DMAs that
     brick HBM→VMEM when it changed (all 8 DMAs overlapped) and materialises
     8 lane-rolled corner views (``CORNER_OFF``), then marches its rays of
     that brick for ``k_steps`` fixed steps; rays in other bricks (or that
     leave their 2×2×2 interpolation cell) stall — predication replaces the
     reference's per-ray ``break`` divergence, and per-sublane residency
     keeps occupancy up when a tile's rays spread over bricks.
  3. The per-window **refresh** gathers all 8 corners' 5-channel rows by a
     broadcast-compare one-hot (iota == point_id) and ONE (40, PVP) MXU
     matmul per sublane against the rolled copies — gather-by-matmul, the
     only fast dynamic addressing on this hardware (``tpu.dynamic_gather``
     is unavailable on the target libtpu; see probe_mosaic.py probe A).

The driver sorts rays once by brick id for locality (the TPU equivalent of
the reference's 0x8000-ray chunk scheduler, .cu:798-946).  Efficiency
requires *coherent* rays (≳ a brick's worth of rays per brick, e.g. camera
bundles) — scattered rays serialise over bricks, the documented trade.
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

# rays per grid program: one (sublane, lane) tile set.  RS (sublane rows per
# tile, each row scheduled against its own resident brick) is overridable for
# experiments: the march step body is a latency-bound dependency chain of
# small vector ops, and wider tiles amortize that chain over more rays
# (benchmarks/probe_r5_rs.py).
import os as _os

RS = int(_os.environ.get("VRT_RS", "8"))
RL = 128
R = RS * RL
# brick extent in cells
BX, BY, BZ = 8, 8, 16
BV = BX * BY * BZ  # cells per brick
# POINT grid per brick: a brick's cells plus the +1 interpolation halo —
# stored WITHOUT corner duplication (the round-1 design duplicated all 8
# corners per cell, an 8× table blowup whose build/fold relayouts dominated
# the train step); the 8 corner views are reconstructed in VMEM by rolls
PX, PY, PZ = BX + 1, BY + 1, BZ + 1
PV = PX * PY * PZ  # 1377 points
PVP = 1408  # PV padded to a lane multiple (11 × 128)
# Table channel STRIDE.  8 channels: [dx_hi, dy_hi, dz_hi, opacity,
# absorption, dx_lo, dy_lo, dz_lo] — the three gradient channels are stored
# as a bf16 SPLIT (hi = bf16-round(x), lo = bf16-round(x - hi), both kept in
# f32 storage whose values are exactly bf16-representable).  This lets the
# one-hot gather matmuls run at Precision.DEFAULT (ONE bf16 MXU pass —
# HIGHEST's multi-pass f32 emulation measured +8.4 us/window on chip) while
# hi + lo reconstructs the f32 value to ~2^-17 relative.  Opacity feeds only
# a sign test (bf16 rounding is sign-exact) and absorption a 2e-2-tolerance
# brightness path, so they carry no lo row.  The stride also satisfies the
# Mosaic DMA rule: every HBM slice ``table[b]`` = (1, TCH, PVP) must be
# aligned to the f32 8-sublane tile ("Slice shape along dimension 1 must be
# aligned to tiling (8)").
TCH = 8
LCH = 5  # channels before the lo rows (dx, dy, dz, opacity, absorption)
NLO = 3  # lo rows (split gradient channels)
RCH = 8 * TCH  # rolled-copy buffer rows: 8 corners × TCH
NCH = 4  # interpolated field channels (3D: dx, dy, dz, opacity)
ABSORB_CH = 4  # cache row of the corner-0 absorption sample (point = cell)
#: lane offset of corner (dx, dy, dz) within a brick's point grid
CORNER_OFF = tuple(
    (dx * PY + dy) * PZ + dz for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
)
DEAD_ID = 0x7FFFFFFF  # plain int: jnp constants may not be captured by kernels
BRIGHT_MAX_F = float(0xFFFFFFFF)


def brick_grid(packed_shape) -> Tuple[int, int, int]:
    """Brick-grid extents for a packed field's spatial shape."""
    cx, cy, cz = (int(s) - 1 for s in packed_shape[:3])
    return (-(-cx // BX), -(-cy // BY), -(-cz // BZ))


def _overlap_windows(a: jax.Array, axis: int, B: int, P: int) -> jax.Array:
    """(…, N·B+1, …) → (…, N, P, …): overlapping windows w[n, j] = a[n·B + j]
    for P = B+1, built DENSELY — the main body is a pure reshape of the first
    N·B entries and the +1 halo plane is the same array shifted by B — no
    gather (XLA TPU gathers with duplicated indices serialize; this is the
    hot relayout of the 256³ train step)."""
    N = (a.shape[axis] - 1) // B
    assert P == B + 1 and a.shape[axis] == N * B + 1
    shp = list(a.shape)
    shp[axis : axis + 1] = [N, B]
    main = jax.lax.slice_in_dim(a, 0, N * B, axis=axis).reshape(shp)
    # halo plane: a[n·B + B] — slice from offset B (length (N-1)·B + 1),
    # pad to N·B, reshape, take each window's first entry
    halo = jax.lax.slice_in_dim(a, B, N * B + 1, axis=axis)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, B - 1)
    halo = jnp.pad(halo, pad).reshape(shp)
    halo = jax.lax.slice_in_dim(halo, 0, 1, axis=axis + 1)  # (…, N, 1, …)
    return jnp.concatenate([main, halo], axis=axis + 1)  # (…, N, P, …)


@functools.partial(jax.jit, static_argnames=("has_absorb",))
def _build_brick_table_jit(packed, absorb, *, has_absorb):
    """Dense POINT-grid table build.  Each brick stores its (PX, PY, PZ)
    point grid (cells + 1-point interpolation halo) row-major in the lane
    axis — adjacent bricks share their boundary plane (the only
    duplication).  The overlapping halo windows are built with
    ``_overlap_windows`` (reshape + shifted slice), NOT ``jnp.take``: the
    gather formulation serialized on TPU and dominated the fused train
    step's constant cost."""
    X, Y, Z, C = packed.shape
    nbx, nby, nbz = brick_grid(packed.shape)
    CX, CY, CZ = nbx * BX, nby * BY, nbz * BZ  # padded cell extents
    packed_p = jnp.pad(
        packed, ((0, CX + 1 - X), (0, CY + 1 - Y), (0, CZ + 1 - Z), (0, 0))
    )
    if not has_absorb:
        absorb = jnp.zeros((1, 1, 1), jnp.float32)
    # absorption is point-sampled at the anchor cell (corner 0), so the cell
    # grid doubles as its point grid; rows past the cell extent are never read
    absorb_p = jnp.pad(
        absorb,
        (
            (0, max(0, CX + 1 - absorb.shape[0])),
            (0, max(0, CY + 1 - absorb.shape[1])),
            (0, max(0, CZ + 1 - absorb.shape[2])),
        ),
    )[: CX + 1, : CY + 1, : CZ + 1]

    vals = jnp.concatenate([packed_p, absorb_p[..., None]], axis=-1)
    hi = vals.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (
        (vals[..., :NLO] - hi[..., :NLO])
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    t = jnp.concatenate([hi, lo], axis=-1)  # (…, TCH): hi×5 then lo×3
    t = _overlap_windows(t, 0, BX, PX)  # (nbx, PX, CY+1, CZ+1, TCH)
    t = _overlap_windows(t, 2, BY, PY)  # (nbx, PX, nby, PY, CZ+1, TCH)
    t = _overlap_windows(t, 4, BZ, PZ)  # (nbx, PX, nby, PY, nbz, PZ, TCH)
    t = t.transpose(0, 2, 4, 6, 1, 3, 5)  # (nbx, nby, nbz, TCH, PX, PY, PZ)
    t = t.reshape(nbx * nby * nbz, TCH, PV)
    return jnp.pad(t, ((0, 0), (0, 0), (0, PVP - PV)))


def absorption_fraction(translucency: jax.Array) -> jax.Array:
    """uint32 translucency grid → float32 per-step absorption fraction
    ``(0xFFFFFFFF - tr) / 0xFFFFFFFF`` (≙ .cu:337-341, in the float
    brightness convention where 1.0 = 0xFFFFFFFF)."""
    return (
        jnp.float32(BRIGHT_MAX_F) - translucency.astype(jnp.float32)
    ) / jnp.float32(BRIGHT_MAX_F)


def build_brick_table(
    packed: jax.Array,
    translucency: Optional[jax.Array] = None,
    *,
    absorb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[int, int, int]]:
    """Brick-major point-grid table (no corner duplication).

    packed: (X, Y, Z, 4) float32 preprocessed diff field (ops/fields.py).
    translucency: optional (X, Y, Z) uint32 cropped translucency grid
      (``cropped_translucency``) — encoded via ``absorption_fraction``.
    absorb: alternatively, the float32 absorption-fraction grid directly
      (used by the differentiable wrapper, which needs float inputs).

    Returns ``(table, nb)``: table (NB, TCH=8, PVP=1408) f32 (5 live
    channels + 3 zero-pad rows for the 8-sublane DMA tile) with
    ``table[b, c, (px*PY+py)*PZ+pz]`` = channel ``c`` (dx, dy, dz, opacity,
    absorption) at POINT ``(bx*BX+px, by*BY+py, bz*BZ+pz)`` of brick
    ``b = (bx*nby + by)*nbz + bz`` — the brick's cells plus their +1
    interpolation halo, with no corner duplication (corner views are
    reconstructed in VMEM by lane rolls of CORNER_OFF).  Points outside the
    valid grid are zero (never evaluated: global bounds predication).
    """
    assert packed.shape[-1] == NCH
    nb = brick_grid(packed.shape)
    if translucency is not None:
        assert absorb is None
        absorb = absorption_fraction(translucency)
    if absorb is None:
        absorb = jnp.zeros((1, 1, 1), jnp.float32)  # unused placeholder
        has = False
    else:
        has = True
    return _build_brick_table_jit(packed, absorb, has_absorb=has), nb


def _march_kernel(
    # inputs
    table_ref,  # (NB, TCH, PVP) f32 in ANY/HBM
    px_ref, py_ref, pz_ref,  # (8, 128) f32 blocks
    dx_ref, dy_ref, dz_ref,  # (8, 128) f32 blocks
    rem_ref, alive_ref,  # (8, 128) i32 blocks
    br_ref,  # (8, 128) f32 brightness block
    # outputs
    opx_ref, opy_ref, opz_ref, odx_ref, ody_ref, odz_ref,
    orem_ref, oalive_ref, obr_ref, ow_ref,
    # scratch
    brick_ref,  # (RS, TCH, PVP) f32 per-sublane resident point-grid bricks
    brickro_ref,  # (RS, RCH, PVP) f32 rolled corner-view copies
    dma_sem,
    *,
    max_windows: int,
    k_steps: int,
    bounds: Tuple[int, int, int],
    nb: Tuple[int, int, int],
    bend: Tuple[float, float, float],
    step: Tuple[float, float, float],
    min_bright: float,
    has_absorb: bool,
    precision,
    ablate: str = "",
):
    xb = jnp.float32(bounds[0] - 1)
    yb = jnp.float32(bounds[1] - 1)
    zb = jnp.float32(bounds[2] - 1)
    bendx, bendy, bendz = (jnp.float32(b) for b in bend)
    stepx, stepy, stepz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)
    minb = jnp.float32(min_bright)
    iota = jax.lax.broadcasted_iota(jnp.int32, (PVP, RL), 0)

    state0 = (
        px_ref[:], py_ref[:], pz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        rem_ref[:],
        alive_ref[:],  # i32 mask: bool select_n is unsupported
        br_ref[:],
    )

    def cond(carry):
        w, prev_ids, state = carry
        return (w < max_windows) & jnp.any(state[7] != 0)

    def window_body(carry):
        w, prev_ids, state = carry
        px, py, pz, dx, dy, dz, rem, alive, br = state

        # ---- window-level liveness (≙ the reference loop condition,
        # .cu:335, evaluated here once per window: rays that stepped out of
        # bounds or budget stall mid-window — they cannot move again — and
        # are reaped here) ----
        inb = (
            (px >= 0) & (px < xb) & (py >= 0) & (py < yb) & (pz >= 0) & (pz < zb)
        )
        alive = jnp.where(inb & (rem > 0), alive, 0)

        # ---- per-lane brick id; per-sublane current = min over its lanes.
        # ONE lane-reduce over the whole (8, 128) tile + ONE any-changed
        # scalar gate replace the former 8 serialized vector→sreg min
        # hand-offs and 16 per-window conditional regions — the scalar
        # traffic only happens on the (rare) brick-switch windows ----
        fpx = jnp.floor(px)
        fpy = jnp.floor(py)
        fpz = jnp.floor(pz)
        cbx = jnp.clip(fpx.astype(jnp.int32) // BX, 0, nbx - 1)
        cby = jnp.clip(fpy.astype(jnp.int32) // BY, 0, nby - 1)
        cbz = jnp.clip(fpz.astype(jnp.int32) // BZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(alive != 0, ids, DEAD_ID)
        cur_min = jnp.min(ids, axis=1, keepdims=True)  # (8, 1) vector
        changed_v = (cur_min != prev_ids) & (cur_min != DEAD_ID)

        # overlapped conditional DMAs: start all changed bricks, then wait;
        # on arrival, materialise the 8 corner views as lane-rolled copies
        # (brickro[o*TCH+c, p] = brick[c, p + CORNER_OFF[o]]) so the per-
        # window refresh is ONE (RCH, PVP) @ (PVP, RL) matmul per sublane
        @pl.when(jnp.any(changed_v))
        def _():
            curs = [cur_min[s, 0] for s in range(RS)]
            prevs = [prev_ids[s, 0] for s in range(RS)]
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
                        # roll(-k): out[p] = in[p + k]; the circular tail only
                        # pollutes p > PVP - k ≥ 1237, beyond any gathered
                        # anchor (max (7·PY+7)·PZ+15 = 1200)
                        # pltpu.roll requires a non-negative shift:
                        # roll(x, PVP - k) == roll(x, -k) on a PVP-circle
                        brickro_ref[s, o * TCH : (o + 1) * TCH] = pltpu.roll(
                            b, (PVP - CORNER_OFF[o]) % PVP, 1
                        )
        new_ids = jnp.where(cur_min != DEAD_ID, cur_min, prev_ids)  # (8, 1)

        # (8, 1) per-sublane current brick, broadcast against lanes
        cur_col = jnp.broadcast_to(cur_min, (RS, RL))
        in_cur = (alive != 0) & (ids == cur_col)

        # local cell id inside each sublane's brick (valid for in_cur lanes)
        b2 = cur_col // nbz
        oxf = ((b2 // nby) * BX).astype(jnp.float32)
        oyf = ((b2 % nby) * BY).astype(jnp.float32)
        ozf = ((cur_col % nbz) * BZ).astype(jnp.float32)
        lx = jnp.clip((fpx - oxf).astype(jnp.int32), 0, BX - 1)
        ly = jnp.clip((fpy - oyf).astype(jnp.int32), 0, BY - 1)
        lz = jnp.clip((fpz - ozf).astype(jnp.int32), 0, BZ - 1)
        lid = (lx * PY + ly) * PZ + lz  # anchor POINT id, (8, 128) in [0, PV)

        # ---- refresh: per-sublane one-hot MXU gather of all 8 corners'
        # TCH-channel rows from the rolled-copy buffer ----
        # cache[o*TCH+c, s, l] = table[c, lid[s, l] + CORNER_OFF[o]]
        if "nogather" in ablate:  # ablation probe: cost of onehot+dots+stack
            cache = jnp.broadcast_to(
                brickro_ref[0, :, :RL][:, None, :], (RCH, RS, RL)
            ) * (1.0 + lid[0, 0].astype(jnp.float32))
        else:
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

        # combine the bf16-split gradient rows ONCE per window (hi + lo
        # reconstructs f32 to ~2^-17; see the TCH layout comment) — the
        # k-step loop then reads 4 combined rows per corner
        chv = [
            [
                cache[o * TCH + c] + cache[o * TCH + LCH + c]
                for c in range(NLO)
            ]
            + [cache[o * TCH + 3]]
            for o in range(8)
        ]

        # cell anchor for this refresh window
        basex, basey, basez = fpx, fpy, fpz

        # window-level evaluability: in_cur & not-crossed rays are inside
        # their (in-bounds) anchor cell, so the per-step bounds check is
        # subsumed — a ray that steps out of bounds simultaneously leaves
        # its cell (crossed) and stalls until the reap above
        evaluable_w = in_cur & (alive != 0)
        if "freeze" in ablate:  # ablation probe: rays never step or die —
            # windows run to max_windows, isolating per-window cost
            evaluable_w = evaluable_w & (px < -3e38)

        def step_body(k, carry):
            px, py, pz, dx, dy, dz, rem, alive, br = carry
            fx = px - basex
            fy = py - basey
            fz = pz - basez
            crossed = (
                (fx < 0) | (fx >= 1.0) | (fy < 0) | (fy >= 1.0) | (fz < 0) | (fz >= 1.0)
            )
            rem_ok = rem > 0
            cond_l = evaluable_w & ~crossed & rem_ok

            if has_absorb:
                # absorption (≙ .cu:337-341): point-sampled at the anchor
                # cell; brightness in [0,1] with 1.0 = 0xFFFFFFFF.  Needs the
                # *current* alive mask: a lane dead since mid-window must
                # stop absorbing (its other updates self-block via ok)
                nbr = jnp.maximum(br - cache[ABSORB_CH], 0.0)
                br = jnp.where(cond_l & (alive != 0), nbr, br)
                dark = br < minb
            else:
                dark = False

            gx = 1.0 - fx
            gy = 1.0 - fy
            gz = 1.0 - fz
            # corner weights in product((0,1)^3) order (x slowest)
            wts = (
                gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
            )
            interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(NCH)]
            for o in range(8):
                for c in range(NCH):
                    interp[c] = interp[c] + wts[o] * chv[o][c]

            opaque = interp[3] > 0.0
            if has_absorb:
                ok = cond_l & ~dark & ~opaque
            else:
                ok = cond_l & ~opaque
            # pure logical ops: select_n on 1-bit vectors does not lower on
            # this Mosaic version.  Mid-window deaths self-block: an opaque/
            # dark/budget exit stays blocked by its own condition; a bounds
            # exit stalls via `crossed` and is reaped at the next window.
            alive_b = ok | (~(evaluable_w & ~crossed) & ((alive != 0) & rem_ok))
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
            rem = rem - ok.astype(jnp.int32)
            return px, py, pz, dx, dy, dz, rem, alive, br

        # chunked step loop with early exit: within a window every ray's
        # steppability is monotone non-increasing (crossed rays stay frozen,
        # opaque/dark blocks are position-stable), so once no ray can step
        # the remaining k-iterations are provably no-ops — skip them.  At
        # k=32 the measured window-step efficiency is ~0.46, i.e. nearly
        # half the iterations were dead.  The liveness check ignores
        # opaque/dark blocks (conservative: may run extra chunks, never
        # skips real work).
        step_chunk = 8 if k_steps % 8 == 0 else k_steps
        n_chunks = k_steps // step_chunk

        def ch_cond(c):
            j, cont, _ = c
            return (j < n_chunks) & cont

        def ch_body(c):
            j, _, s = c
            s = jax.lax.fori_loop(0, step_chunk, step_body, s)
            fx2 = s[0] - basex
            fy2 = s[1] - basey
            fz2 = s[2] - basez
            crossed2 = (
                (fx2 < 0) | (fx2 >= 1.0) | (fy2 < 0) | (fy2 >= 1.0)
                | (fz2 < 0) | (fz2 >= 1.0)
            )
            cont = jnp.any(evaluable_w & ~crossed2 & (s[6] > 0))
            return j + 1, cont, s

        _, _, state = jax.lax.while_loop(
            ch_cond,
            ch_body,
            (
                jnp.int32(0),
                jnp.asarray(True),
                (px, py, pz, dx, dy, dz, rem, alive, br),
            ),
        )
        return w + 1, new_ids, state

    w, _, state = jax.lax.while_loop(
        cond, window_body, (jnp.int32(0), jnp.full((RS, 1), -1, jnp.int32), state0)
    )
    px, py, pz, dx, dy, dz, rem, alive, br = state

    opx_ref[:] = px
    opy_ref[:] = py
    opz_ref[:] = pz
    odx_ref[:] = dx
    ody_ref[:] = dy
    odz_ref[:] = dz
    orem_ref[:] = rem
    oalive_ref[:] = alive
    obr_ref[:] = br
    # windows used (saturation detector: == max_windows ⇒ truncated march)
    ow_ref[:] = jnp.full((RS, RL), 1, jnp.int32) * w


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "k_steps", "max_windows", "interpret",
        "bounds", "nb", "bend", "step", "min_bright", "has_absorb",
        "n_tiles", "precision", "ablate",
    ),
)
def _march_call(
    table, px, py, pz, dx, dy, dz, rem, alive, br,
    *, budget, k_steps, max_windows, interpret, bounds, nb, bend, step,
    min_bright, has_absorb, n_tiles, precision, ablate="",
):
    kernel = functools.partial(
        _march_kernel,
        max_windows=max_windows,
        k_steps=k_steps,
        bounds=bounds,
        nb=nb,
        bend=bend,
        step=step,
        min_bright=min_bright,
        has_absorb=has_absorb,
        precision=precision,
        ablate=ablate,
    )
    n = n_tiles * R
    # state travels as (rows, 128) — the kernel sees native (8, 128) tiles
    state_spec = pl.BlockSpec((RS, RL), lambda t: (t, 0))
    f32s = jax.ShapeDtypeStruct((n // RL, RL), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n // RL, RL), jnp.int32)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # brick table stays in HBM
            *[state_spec] * 9,
        ],
        out_specs=[state_spec] * 10,
        out_shape=[f32s] * 6 + [i32s, i32s, f32s, i32s],
        scratch_shapes=[
            pltpu.VMEM((RS, TCH, PVP), jnp.float32),
            pltpu.VMEM((RS, RCH, PVP), jnp.float32),
            pltpu.SemaphoreType.DMA((RS,)),
        ],
        interpret=interpret,
    )
    return call(table, px, py, pz, dx, dy, dz, rem, alive, br)


def march_pallas(
    packed: jax.Array,
    start_position: jax.Array,
    start_direction: jax.Array,
    budget: int,
    *,
    bend_scale,
    step_scale,
    translucency: Optional[jax.Array] = None,
    absorb: Optional[jax.Array] = None,
    minimum_brightness: int = 0,
    k_steps: int = 16,
    max_windows: Optional[int] = None,
    interpret: bool = False,
    sort_rays: bool = True,
    precision=jax.lax.Precision.DEFAULT,
    table: Optional[jax.Array] = None,
    nb: Optional[Tuple[int, int, int]] = None,
    return_state: bool = False,
    layout: str = "points",
    record_path: bool = False,
    _ablate: str = "",
) -> TraceResult:
    """Forward float march through ``packed`` using the brick-walking kernel.

    ``layout="lines"`` dispatches to the line-table kernel
    (``kernels.march_lines.march_lines`` — faster table build/fold, single-
    M-tile gather); ``table``/``nb`` must then come from
    ``line_table.build_line_table``.

    Semantics identical to ``ops.march.march_float(..., opaque_when_positive=
    True, nearest=False)`` including absorption/minimum-brightness
    (brightness carried as float32 with 1.0 = 0xFFFFFFFF).  Positions in the
    packed-grid frame.  Pass a prebuilt ``(table, nb)`` (from
    ``build_brick_table``) to skip rebuilding it per call.  ``absorb`` is the
    float32 absorption-fraction alternative to ``translucency`` (see
    ``build_brick_table``).

    With ``return_state=True`` also returns a dict with the *raw* kernel
    state in input ray order — ``remaining`` (i32, = budget-1 minus executed
    steps, *not* zeroed for still-alive rays) and ``alive`` (i32) — the
    executed-step residual the custom-VJP backward replay needs (an
    alive-at-max_windows ray keeps remaining > 0, so ``end_iteration`` alone
    would overstate its executed steps).
    """
    if layout == "lines":
        from .march_lines import march_lines

        assert not _ablate, "ablation probes are point-layout only"
        return march_lines(
            packed, start_position, start_direction, budget,
            bend_scale=bend_scale, step_scale=step_scale,
            translucency=translucency, absorb=absorb,
            minimum_brightness=minimum_brightness, k_steps=k_steps,
            max_windows=max_windows, interpret=interpret,
            sort_rays=sort_rays, precision=precision,
            table=table, nb=nb, return_state=return_state,
            record_path=record_path,
        )
    assert record_path is False, "record_path requires layout='lines'"
    assert packed.ndim == 4 and packed.shape[-1] == NCH, "3D packed field required"
    n_in, dim = start_position.shape
    assert dim == 3
    bounds = tuple(int(s) for s in packed.shape[:-1])
    bend = tuple(float(b) for b in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,)))
    step = tuple(float(s) for s in np.broadcast_to(np.asarray(step_scale, np.float32), (3,)))

    if table is None:
        table, nb = build_brick_table(packed, translucency, absorb=absorb)
    assert nb is not None
    has_absorb = translucency is not None or absorb is not None

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
    br = jnp.ones((n,), jnp.float32)
    if max_windows is None:
        # every window the min-brick group either steps or dies; the ow
        # output reports saturation if a pathological ray layout exceeds it
        max_windows = 2 * budget + 64

    rows = n // RL
    outs = _march_call(
        table,
        pos[:, 0].reshape(rows, RL), pos[:, 1].reshape(rows, RL),
        pos[:, 2].reshape(rows, RL),
        dirs[:, 0].reshape(rows, RL), dirs[:, 1].reshape(rows, RL),
        dirs[:, 2].reshape(rows, RL),
        rem.reshape(rows, RL), alive.reshape(rows, RL), br.reshape(rows, RL),
        budget=budget, k_steps=k_steps, max_windows=max_windows,
        interpret=interpret, bounds=bounds, nb=nb, bend=bend, step=step,
        min_bright=float(minimum_brightness) / BRIGHT_MAX_F,
        has_absorb=has_absorb,
        n_tiles=n // R, precision=precision, ablate=_ablate,
    )
    windows_used = outs[9][:: R // RL, 0]  # one entry per tile
    outs = [o.reshape(n) for o in outs[:9]]
    if inv is not None:
        outs = [o[inv] for o in outs]
    px, py, pz, dx, dy, dz, rem, alive, br = outs

    end_pos = jnp.stack([px, py, pz], axis=-1)[:n_in]
    end_dir = jnp.stack([dx, dy, dz], axis=-1)[:n_in]
    rem = rem[:n_in]
    alive = alive[:n_in]
    br = br[:n_in]
    end_remaining = jnp.where(alive != 0, 0, rem).astype(jnp.uint32)
    end_iteration = jnp.uint32(budget) - end_remaining
    # f32 cannot represent 0xFFFFFFFF exactly: saturate explicitly
    remaining_light = jnp.where(
        br >= 1.0,
        jnp.uint32(0xFFFFFFFF),
        (br * BRIGHT_MAX_F).astype(jnp.uint32),
    )
    result = TraceResult(
        end_position=end_pos,
        end_direction=end_dir,
        end_iteration=end_iteration,
        remaining_light=remaining_light,
        path=None,
        windows_used=windows_used,
    )
    if return_state:
        return result, {"remaining": rem, "alive": alive}
    return result
