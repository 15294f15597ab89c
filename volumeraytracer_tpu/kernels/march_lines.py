"""Pallas TPU march kernels over the LINE-major brick table.

Same physics and scheduler as the point-grid kernels (march_pallas.py /
march_bwd.py — the reference hot loop, /root/reference/src/
cuda_volume_raytracer.cu:317-374, and its new reverse-replay adjoint), but the
resident brick is the line table of ``line_table.py``:

    brick[z*TCH + c, px*LPY + py]  —  (LS=72, LL=128) per 10×10×8-cell brick

which changes the per-window refresh from

    point:  8 lane-rolled corner copies + one-hot(K=1408) @ (RCH=64, PVP)
            (11 MXU K-tiles per sublane, 2.9 MB rolled-copy scratch)
to
    lines:  ONE (72, 128) @ (128, 4·128) matmul per sublane — the 4 one-hot
            column blocks select the (dx, dy) corner LINES (lane offsets
            0 / 1 / LPY / LPY+1) — followed by a 9-iteration per-window
            z-mask selecting the (z, z+1) corner pair from each gathered
            line.  M = 72 ≤ 128: a single MXU M-tile, no rolls, no rolled-
            copy scratch (VMEM drops ~5 MB across the kernel pair).

The backward's transpose-scatter becomes the mirror image: z-SPREAD the
per-corner gradients onto line rows, then one ``dG @ onehotᵀ`` per sublane;
the flush needs no corner roll-fold — the accumulator already is point-grad
lines, RMW-DMA'd straight into the (NB, LS, LL) gradient table and folded
densely by ``fold_line_grads``.

Numerics are identical to the point kernels (bf16 hi/lo split table rows,
DEFAULT-precision single-pass matmuls, runtime hi/lo split of the scatter
rows); parity is asserted against both the point kernels and the XLA march
in tests/test_lines.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from ..types import TraceResult

#: production defaults for the dual-brick residency scheduler and anchor
#: shape, overridable for experiments (benchmarks/probe_r5_dual.py, bench
#: A/Bs).  anchor2x defaults OFF since round 5: it bought window length
#: when single-brick residency starved efficiency, but its dual-sub-cell
#: step body costs ~2x per window and dual residency restored efficiency
#: without it (dual 1-cell k32 0.697 vs dual 2x k64 0.595 Gsteps/s,
#: same-run A/B, probe_r5_dual.py).
DUAL_FWD_DEFAULT = _os.environ.get("VRT_DUAL_FWD", "1") == "1"
DUAL_BWD_DEFAULT = _os.environ.get("VRT_DUAL_BWD", "1") == "1"
ANCHOR2X_DEFAULT = _os.environ.get("VRT_A2X", "0") == "1"
from .march_pallas import (
    ABSORB_CH,
    BRIGHT_MAX_F,
    DEAD_ID,
    LCH,
    NLO,
    R,
    RL,
    RS,
    TCH,
    absorption_fraction,
)
from .line_table import (
    LBX,
    LBY,
    LBZ,
    LINE_OFF,
    LL,
    LPY,
    LPZ,
    LS,
    NLINES,
    build_line_table,
    fold_line_grads,
    line_brick_grid,
)

# gradient accumulator rows: same (z, channel) line layout as the forward
# table — rows c ∈ {0,1,2} carry the packed-field gradient channels, row 3
# the (straight-through, zero) opacity slot, rows 4-7 stay zero
GLS = LS


class PathRecording(NamedTuple):
    """Raw in-kernel path snapshots, all device arrays (a pytree — can flow
    through jit/custom_vjp).  ``unscramble_path`` turns it into the
    reference's per-ray (N, budget+1, dim) path contract on the host."""

    raw: jax.Array  #: (T, MW, K, 3, RS, RL) per-window snapshots
    start_sorted: jax.Array  #: (n, 3) start positions in kernel (sorted) order
    inv: Optional[jax.Array]  #: sort inverse permutation (None if unsorted)
    windows_used: jax.Array  #: (T,) windows executed per ray tile


def unscramble_path(rec: "PathRecording", budget: int, n_in: int):
    """Host-side PathRecording → (n_in, budget+1, 3) per-ray paths (see
    ``_unscramble_path``).  Must be called OUTSIDE jit (numpy)."""
    return _unscramble_path(
        rec.raw, rec.windows_used, rec.start_sorted, budget,
        None if rec.inv is None else np.asarray(rec.inv), n_in,
    )


def _corner_lines(lin_s: jax.Array) -> jax.Array:
    """(1, RL) anchor line ids → (1, 4·RL) corner line ids in LINE_OFF order."""
    return jnp.concatenate([lin_s + o for o in LINE_OFF], axis=1)


#: lane offsets of the 6 corner lines of a 2-cell-x anchor slab:
#: (dx, dy) for dx ∈ {0,1,2}, dy ∈ {0,1}
LINE_OFF2X = (0, 1, LPY, LPY + 1, 2 * LPY, 2 * LPY + 1)


def _corner_lines2x(lin_s: jax.Array) -> jax.Array:
    """(1, RL) slab-base line ids → (1, 6·RL) corner line ids."""
    return jnp.concatenate([lin_s + o for o in LINE_OFF2X], axis=1)


def _corner_channels2x(acc0: jax.Array, acc1: jax.Array):
    """2-cell-x variant of ``_corner_channels``: returns (chv_lo, chv_hi,
    absorb_lo, absorb_hi) — the 8-corner channel rows of the two x-sub-cells
    of the anchor slab (line blocks (dx, dy) with dx ∈ {0,1,2})."""
    def chv_at(xoff):
        chv = []
        for dx_ in (0, 1):
            for dy_ in (0, 1):
                j = (dx_ + xoff) * 2 + dy_
                sl = slice(j * RL, (j + 1) * RL)
                for acc in (acc0, acc1):  # dz = 0, 1
                    chv.append(
                        [acc[c, :, sl] + acc[LCH + c, :, sl] for c in range(NLO)]
                        + [acc[3, :, sl]]
                    )
        return chv

    absorb_lo = acc0[ABSORB_CH, :, 0:RL]
    absorb_hi = acc0[ABSORB_CH, :, 2 * RL : 3 * RL]
    return chv_at(0), chv_at(1), absorb_lo, absorb_hi


def _zselect(G: jax.Array, lz4: jax.Array):
    """Per-window z-selection of the (z, z+1) corner pair from gathered lines.

    G: (LS, RS, 4·RL) — all LPZ z-points × TCH channels of the 4 corner
    lines, per sublane.  lz4: (RS, 4·RL) anchor z (tiled over the 4 line
    blocks).  Returns (acc0, acc1): (TCH, RS, 4·RL) channel rows at z = lz
    and z = lz+1.  A 9-iteration static mask loop — the anchor cell is fixed
    within a window, so this runs once per window, not per step.
    """
    lz4 = lz4[None]  # (1, RS, 4RL)
    acc0 = jnp.zeros((TCH,) + G.shape[1:], jnp.float32)
    acc1 = jnp.zeros((TCH,) + G.shape[1:], jnp.float32)
    prev = None
    for z in range(LPZ):
        m = (lz4 == z).astype(jnp.float32)
        blk = G[z * TCH : (z + 1) * TCH]
        acc0 = acc0 + blk * m
        if prev is not None:
            acc1 = acc1 + blk * prev
        prev = m
    return acc0, acc1


def _corner_channels(acc0: jax.Array, acc1: jax.Array):
    """(acc0, acc1) → per-corner channel rows ``chv[o][c]`` of (RS, RL), in
    the product((0,1)^3) corner order of the point kernels (dz fastest), with
    the bf16 hi/lo gradient rows combined; plus the corner-0 absorption row."""
    chv = []
    for dx_ in (0, 1):
        for dy_ in (0, 1):
            j = dx_ * 2 + dy_
            sl = slice(j * RL, (j + 1) * RL)
            for acc in (acc0, acc1):  # dz = 0, 1
                chv.append(
                    [acc[c, :, sl] + acc[LCH + c, :, sl] for c in range(NLO)]
                    + [acc[3, :, sl]]
                )
    absorb_row = acc0[ABSORB_CH, :, 0:RL]
    return chv, absorb_row


def _march_kernel_lines(
    # inputs
    table_ref,  # (NB, LS, LL) f32 in ANY/HBM
    px_ref, py_ref, pz_ref,  # (8, 128) f32 blocks
    dx_ref, dy_ref, dz_ref,
    rem_ref, alive_ref,  # (8, 128) i32 blocks
    br_ref,
    # outputs (+ optional path_ref in ANY/HBM when record_path), then
    # scratch: brick_ref, (optional pbuf_ref,) dma_sem (+ path_sem)
    *refs,
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
    anchor2x: bool = False,
    record_path: bool = False,
    dual: bool = False,
):
    if record_path:
        (opx_ref, opy_ref, opz_ref, odx_ref, ody_ref, odz_ref,
         orem_ref, oalive_ref, obr_ref, ow_ref, path_ref,
         brick_ref, chvm_ref, pbuf_ref, dma_sem, path_sem) = refs
    else:
        (opx_ref, opy_ref, opz_ref, odx_ref, ody_ref, odz_ref,
         orem_ref, oalive_ref, obr_ref, ow_ref,
         brick_ref, chvm_ref, dma_sem) = refs
    xb = jnp.float32(bounds[0] - 1)
    yb = jnp.float32(bounds[1] - 1)
    zb = jnp.float32(bounds[2] - 1)
    bendx, bendy, bendz = (jnp.float32(b) for b in bend)
    stepx, stepy, stepz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)
    minb = jnp.float32(min_bright)
    nblk = 6 if anchor2x else 4
    iota = jax.lax.broadcasted_iota(jnp.int32, (LL, nblk * RL), 0)
    tile_id = pl.program_id(0) if record_path else None

    state0 = (
        px_ref[:], py_ref[:], pz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        rem_ref[:],
        alive_ref[:],
        br_ref[:],
    )

    def cond(carry):
        w, prev_ids, state = carry
        return (w < max_windows) & jnp.any(state[7] != 0)

    def window_body(carry):
        w, prev_ids, state = carry
        px, py, pz, dx, dy, dz, rem, alive, br = state

        # window-level liveness reap (see march_pallas)
        inb = (
            (px >= 0) & (px < xb) & (py >= 0) & (py < yb) & (pz >= 0) & (pz < zb)
        )
        alive = jnp.where(inb & (rem > 0), alive, 0)

        fpx = jnp.floor(px)
        fpy = jnp.floor(py)
        fpz = jnp.floor(pz)
        cbx = jnp.clip(fpx.astype(jnp.int32) // LBX, 0, nbx - 1)
        cby = jnp.clip(fpy.astype(jnp.int32) // LBY, 0, nby - 1)
        cbz = jnp.clip(fpz.astype(jnp.int32) // LBZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(alive != 0, ids, DEAD_ID)
        if dual:
            # ---- dual-brick residency (round 5): each sublane keeps TWO
            # resident bricks.  A sorted bundle's 128-lane sublane typically
            # straddles 2 bricks at any time (the sort groups rays by START
            # brick; they cross boundaries at different steps), and the
            # single-min scheduler idles the off-brick lanes through whole
            # windows — measured window-step efficiency 0.43 vs 0.85 for
            # brick-aligned rays (benchmarks/probe_r5_eff.py).  The two
            # gathers' outputs are merged per LANE once per window (the
            # anchor brick of a lane is window-constant), so the step body
            # is untouched.  Slot contents are tracked in the carry
            # (cont0, cont1); evictions avoid the slot the other needed
            # brick occupies.
            cont0 = prev_ids[:, 0:1]
            cont1 = prev_ids[:, 1:2]
            need_a = jnp.min(ids, axis=1, keepdims=True)  # (RS, 1)
            ids_b = jnp.where(ids == need_a, DEAD_ID, ids)
            need_b = jnp.min(ids_b, axis=1, keepdims=True)
            vA = need_a != DEAD_ID
            vB = need_b != DEAD_ID
            hitA = (need_a == cont0) | (need_a == cont1)
            hitB = (need_b == cont0) | (need_b == cont1)
            if "dmaevery" in ablate:
                # cost probe: force the conditional-DMA region to fire
                # every window (re-copies identical data — semantics
                # unchanged); isolates the region's scalar-extract + DMA
                # cost, which the freeze fixed-cost probe never exercises
                hitA = hitA & (need_a == DEAD_ID)
                hitB = hitB & (need_b == DEAD_ID)
            destA = jnp.where(hitB & (cont0 == need_b), 1, 0)
            slotA = jnp.where(
                hitA, jnp.where(cont0 == need_a, 0, 1), destA
            )
            placeA = (~hitA) & vA
            destB = 1 - slotA
            placeB = (~hitB) & vB

            # which physical slot j receives the A / B brick — static slot
            # indices (Mosaic-friendly), int32 flags (bool scalars cannot be
            # extracted from vectors)
            recvA = [
                (placeA & (destA == j)).astype(jnp.int32) for j in (0, 1)
            ]
            recvB = [
                (placeB & (destB == j)).astype(jnp.int32) for j in (0, 1)
            ]

            @pl.when(jnp.any(placeA | placeB))
            def _():
                for s in range(RS):
                    for j in range(2):
                        @pl.when(recvA[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_a[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).start()
                        @pl.when(recvB[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_b[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).start()
                for s in range(RS):
                    for j in range(2):
                        @pl.when(recvA[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_a[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).wait()
                        @pl.when(recvB[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_b[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).wait()

            ncont0 = jnp.where(placeA & (destA == 0), need_a, cont0)
            ncont0 = jnp.where(placeB & (destB == 0), need_b, ncont0)
            ncont1 = jnp.where(placeA & (destA == 1), need_a, cont1)
            ncont1 = jnp.where(placeB & (destB == 1), need_b, ncont1)
            new_ids = jnp.concatenate([ncont0, ncont1], axis=1)  # (RS, 2)
            in_s1 = (alive != 0) & (
                ids == jnp.broadcast_to(ncont1, (RS, RL))
            )
            in_cur = in_s1 | (
                (alive != 0) & (ids == jnp.broadcast_to(ncont0, (RS, RL)))
            )
            org = ids  # per-lane brick: each lane anchors in its OWN brick
        else:
            cur_min = jnp.min(ids, axis=1, keepdims=True)  # (8, 1)
            changed_v = (cur_min != prev_ids) & (cur_min != DEAD_ID)

            # overlapped conditional brick DMAs — no rolled copies in the
            # line layout: the gather matmul reads brick_ref directly
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
            new_ids = jnp.where(cur_min != DEAD_ID, cur_min, prev_ids)

            cur_col = jnp.broadcast_to(cur_min, (RS, RL))
            in_cur = (alive != 0) & (ids == cur_col)
            org = cur_col

        # local cell coords inside each lane's brick (single-residency: the
        # sublane's min brick; dual: the lane's own brick — values for
        # non-evaluable lanes are arithmetic don't-cares)
        b2 = org // nbz
        oxf = ((b2 // nby) * LBX).astype(jnp.float32)
        oyf = ((b2 % nby) * LBY).astype(jnp.float32)
        ozf = ((org % nbz) * LBZ).astype(jnp.float32)
        lx = jnp.clip((fpx - oxf).astype(jnp.int32), 0, LBX - 1)
        ly = jnp.clip((fpy - oyf).astype(jnp.int32), 0, LBY - 1)
        lz = jnp.clip((fpz - ozf).astype(jnp.int32), 0, LBZ - 1)
        if anchor2x:
            # 2-cell-x anchor slab [base, base+2): base biased one cell
            # upstream of the travel direction, clipped so the slab's point
            # rows (base .. base+2 ≤ LPX-1) stay inside the brick — a window
            # then marches ~1.5 cells instead of the ~0.5 the mid-cell
            # 1-cell anchor averages (window-step efficiency 0.46 → ~0.7)
            base_lx = jnp.clip(
                lx - (dx < 0.0).astype(jnp.int32), 0, LBX - 2
            )
            lin = base_lx * LPY + ly
            basex_a = oxf + base_lx.astype(jnp.float32)
        else:
            lin = lx * LPY + ly  # anchor LINE id, (8, 128) in [0, NLINES)
            basex_a = fpx

        # ---- refresh: one 4-block one-hot line-gather matmul per sublane,
        # then the per-window z-selection (module docstring) ----
        if "nogather" in ablate:  # ablation probe: cost of onehot+dot+zsel
            fake = jnp.broadcast_to(
                brick_ref[0, 0:1, :RL], (RS, RL)
            ) * (1.0 + lin[0, 0].astype(jnp.float32) + lz[0, 0].astype(jnp.float32))
            chv = [[fake] * 4 for _ in range(8)]
            absorb_row = fake
        elif "nozsel" in ablate:  # ablation probe: dots kept, zsel skipped
            parts = []
            for s in range(RS):
                onehot = (iota == _corner_lines(lin[s : s + 1, :])).astype(
                    jnp.float32
                )
                parts.append(
                    jax.lax.dot_general(
                        brick_ref[s], onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                )
            G = jnp.stack(parts, axis=1)
            fake = G[0, :, 0:RL] + G[1, :, 0:RL]
            chv = [[fake] * 4 for _ in range(8)]
            absorb_row = fake
        else:
            lines_fn = _corner_lines2x if anchor2x else _corner_lines
            parts = []
            for s in range(RS):
                onehot = (iota == lines_fn(lin[s : s + 1, :])).astype(
                    jnp.float32
                )
                if dual:
                    # one one-hot per sublane, TWO gathers (one per resident
                    # brick); merged per lane below — each lane's line id is
                    # relative to its OWN brick, so the gather row is valid
                    # exactly for the slot holding that brick
                    d = tuple(
                        jax.lax.dot_general(
                            brick_ref[2 * s + j],
                            onehot,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision,
                        )
                        for j in (0, 1)
                    )
                else:
                    d = jax.lax.dot_general(
                        brick_ref[s],
                        onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )  # (LS, nblk·RL)
                    if "dots2" in ablate:  # in-situ marginal-cost probe: the
                        # same dot twice, averaged — semantics unchanged
                        d = 0.5 * (d + jax.lax.dot_general(
                            brick_ref[s],
                            onehot,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision,
                        ))
                parts.append(d)
            lz4 = jnp.concatenate([lz] * nblk, axis=1)  # (RS, nblk·RL)
            if dual:
                # merge the two bricks' windows at the CORNER-ROW level (66
                # small (RS, RL) selects) instead of materializing a merged
                # (LS, RS, nblk·RL) G — keeps the peak live set small so the
                # step loop's corner rows stay resident (a G-level merge
                # measured 2x the per-window cost: spill/remat)
                Ga = jnp.stack([p[0] for p in parts], axis=1)
                Gb = jnp.stack([p[1] for p in parts], axis=1)
                acc0a, acc1a = _zselect(Ga, lz4)
                acc0b, acc1b = _zselect(Gb, lz4)

                def merge(a, b):
                    return jnp.where(in_s1, b, a)

                if anchor2x:
                    lo_a, hi_a, abl_a, abh_a = _corner_channels2x(acc0a, acc1a)
                    lo_b, hi_b, abl_b, abh_b = _corner_channels2x(acc0b, acc1b)
                    chv_lo = [
                        [merge(lo_a[o][c], lo_b[o][c]) for c in range(4)]
                        for o in range(8)
                    ]
                    chv_hi = [
                        [merge(hi_a[o][c], hi_b[o][c]) for c in range(4)]
                        for o in range(8)
                    ]
                    absorb_lo = merge(abl_a, abl_b)
                    absorb_hi = merge(abh_a, abh_b)
                else:
                    chv_a, ab_a = _corner_channels(acc0a, acc1a)
                    chv_b, ab_b = _corner_channels(acc0b, acc1b)
                    chv = [
                        [merge(chv_a[o][c], chv_b[o][c]) for c in range(4)]
                        for o in range(8)
                    ]
                    absorb_row = merge(ab_a, ab_b)
            else:
                G = jnp.stack(parts, axis=1)  # (LS, RS, nblk·RL)
                acc0, acc1 = _zselect(G, lz4)
                if "zsel2" in ablate:  # in-situ marginal-cost probe
                    b0, b1 = _zselect(G, lz4)
                    acc0 = 0.5 * (acc0 + b0)
                    acc1 = 0.5 * (acc1 + b1)
                if anchor2x:
                    chv_lo, chv_hi, absorb_lo, absorb_hi = _corner_channels2x(
                        acc0, acc1
                    )
                else:
                    chv, absorb_row = _corner_channels(acc0, acc1)

        basex, basey, basez = basex_a, fpy, fpz
        evaluable_w = in_cur & (alive != 0)
        if "freeze" in ablate:  # ablation probe: rays never step or die
            evaluable_w = evaluable_w & (px < -3e38)

        xlim = 2.0 if anchor2x else 1.0

        # ---- corner-row materialisation (round 5): write the merged
        # per-window corner rows into a VMEM scratch once and LOAD them in
        # the step body.  Kept live as values, the rows + their gather
        # dataflow get spilled/rematerialised across the chunk loop by the
        # compiler — the production step slot measured ~1 µs while the
        # identical body with register/ref-resident rows runs at 210 ns
        # (benchmarks/probe_r5_stepbody.py).  Explicit loads cost ~35 ns of
        # issue per step and make the remat impossible. ("nomat" A/B.)
        mat = (
            "nomat" not in ablate
            and "nogather" not in ablate
            and "nozsel" not in ablate
        )
        if mat:
            if anchor2x:
                for o in range(8):
                    for c in range(4):
                        chvm_ref[o * 4 + c] = chv_lo[o][c]
                        chvm_ref[32 + o * 4 + c] = chv_hi[o][c]
                if has_absorb:
                    chvm_ref[64] = absorb_lo
                    chvm_ref[65] = absorb_hi
            else:
                for o in range(8):
                    for c in range(4):
                        chvm_ref[o * 4 + c] = chv[o][c]
                if has_absorb:
                    chvm_ref[32] = absorb_row

        def _load_rows():
            """Fetch the materialised corner rows from the scratch —
            called once per CHUNK (8 unrolled steps): per-step loads
            measured ~1 µs/step of load cost, per-chunk amortises 8×
            while the 8-step live range is small enough to stay in
            registers (probe_r5_stepbody's refs+flat config = 210 ns)."""
            if anchor2x:
                lo = [
                    [chvm_ref[o * 4 + c] for c in range(4)] for o in range(8)
                ]
                hi = [
                    [chvm_ref[32 + o * 4 + c] for c in range(4)]
                    for o in range(8)
                ]
                ab = (
                    (chvm_ref[64], chvm_ref[65]) if has_absorb else (None, None)
                )
                return lo, hi, ab[0], ab[1]
            ch = [[chvm_ref[o * 4 + c] for c in range(4)] for o in range(8)]
            return ch, (chvm_ref[32] if has_absorb else None)

        def step_body(k, carry, rows=None):
            px, py, pz, dx, dy, dz, rem, alive, br = carry
            if mat:
                if rows is None:
                    rows = _load_rows()
                if anchor2x:
                    chv_lo_l, chv_hi_l, absorb_lo_l, absorb_hi_l = rows
                else:
                    chv_l, absorb_row_l = rows
            else:
                if anchor2x:
                    chv_lo_l, chv_hi_l = chv_lo, chv_hi
                    if has_absorb:
                        absorb_lo_l, absorb_hi_l = absorb_lo, absorb_hi
                else:
                    chv_l = chv
                    if has_absorb:
                        absorb_row_l = absorb_row
            fx = px - basex
            fy = py - basey
            fz = pz - basez
            crossed = (
                (fx < 0) | (fx >= xlim) | (fy < 0) | (fy >= 1.0) | (fz < 0) | (fz >= 1.0)
            )
            rem_ok = rem > 0
            cond_l = evaluable_w & ~crossed & rem_ok

            if anchor2x:
                # which x-sub-cell of the slab the ray is in this step
                sel = fx >= 1.0
                fxl = jnp.where(sel, fx - 1.0, fx)
                if has_absorb:
                    absorb_here = jnp.where(sel, absorb_hi_l, absorb_lo_l)
            else:
                fxl = fx
                if has_absorb:
                    absorb_here = absorb_row_l

            if has_absorb:
                nbr = jnp.maximum(br - absorb_here, 0.0)
                br = jnp.where(cond_l & (alive != 0), nbr, br)
                dark = br < minb
            else:
                dark = False

            gx = 1.0 - fxl
            gy = 1.0 - fy
            gz = 1.0 - fz
            wts = (
                gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                fxl * gy * gz, fxl * gy * fz, fxl * fy * gz, fxl * fy * fz,
            )
            if anchor2x:
                acc_lo = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                acc_hi = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                for o in range(8):
                    for c in range(4):
                        acc_lo[c] = acc_lo[c] + wts[o] * chv_lo_l[o][c]
                        acc_hi[c] = acc_hi[c] + wts[o] * chv_hi_l[o][c]
                interp = [
                    jnp.where(sel, acc_hi[c], acc_lo[c]) for c in range(4)
                ]
            else:
                interp = [jnp.zeros((RS, RL), jnp.float32) for _ in range(4)]
                for o in range(8):
                    for c in range(4):
                        interp[c] = interp[c] + wts[o] * chv_l[o][c]

            opaque = interp[3] > 0.0
            if has_absorb:
                ok = cond_l & ~dark & ~opaque
            else:
                ok = cond_l & ~opaque
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

        # chunked step loop with early exit (see march_pallas)
        step_chunk = 8 if k_steps % 8 == 0 else k_steps
        n_chunks = k_steps // step_chunk
        # The chunk body is python-unrolled by default (measured +5-7% over
        # a Mosaic fori_loop: the compiler software-pipelines consecutive
        # step bodies; "nounroll" restores the hardware loop for A/B).
        # "noearly": drop the chunk-level early-exit while_loop (trade
        # wasted predicated steps for zero scalar-sync per chunk) —
        # measured neutral, kept as a probe.
        unroll = ("nounroll" not in ablate) and not record_path

        def run_chunk(s):
            if unroll:
                rows = _load_rows() if mat else None
                for k in range(step_chunk):
                    s = step_body(k, s, rows)
                return s
            return jax.lax.fori_loop(0, step_chunk, step_body, s)

        if "flat" in ablate and not record_path:
            # probe: the whole window fully unrolled — no chunk loop, no
            # early exit, rows loaded once per WINDOW (isolates the
            # per-chunk overhead at the cost of ~15% wasted slots)
            rows = _load_rows() if mat else None
            s = (px, py, pz, dx, dy, dz, rem, alive, br)
            for k in range(k_steps):
                s = step_body(k, s, rows)
            return w + 1, new_ids, s

        if "noearly" in ablate and not record_path:

            def ne_body(j, s):
                return run_chunk(s)

            state = jax.lax.fori_loop(
                0, n_chunks, ne_body,
                (px, py, pz, dx, dy, dz, rem, alive, br),
            )
            return w + 1, new_ids, state

        def ch_cond(c):
            j, cont, _ = c
            return (j < n_chunks) & cont

        def ch_body(c):
            j, _, s = c
            if record_path:
                # record every lane's position after every step of this
                # window into the VMEM staging buffer; stalled lanes repeat
                # their position and the host driver dedups (an executed
                # step always moves a ray, so consecutive-equal == stall)
                base_k = j * step_chunk

                def body(k, carry):
                    carry = step_body(k, carry)
                    idx = base_k + k
                    pbuf_ref[pl.ds(idx, 1), 0] = carry[0][None]
                    pbuf_ref[pl.ds(idx, 1), 1] = carry[1][None]
                    pbuf_ref[pl.ds(idx, 1), 2] = carry[2][None]
                    return carry

                s = jax.lax.fori_loop(0, step_chunk, body, s)
            else:
                s = run_chunk(s)
            fx2 = s[0] - basex
            fy2 = s[1] - basey
            fz2 = s[2] - basez
            crossed2 = (
                (fx2 < 0) | (fx2 >= xlim) | (fy2 < 0) | (fy2 >= 1.0)
                | (fz2 < 0) | (fz2 >= 1.0)
            )
            cont = jnp.any(evaluable_w & ~crossed2 & (s[6] > 0))
            if record_path:
                # the early exit would leave the staging buffer's tail rows
                # unwritten (stale/NaN) — in record mode run every chunk;
                # the dead steps' writes repeat positions and dedup away
                cont = jnp.asarray(True)
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

        if record_path:
            # one DMA per window: staging buffer -> path_hbm[tile, w]
            cp = pltpu.make_async_copy(
                pbuf_ref, path_ref.at[tile_id, w], path_sem
            )
            cp.start()
            cp.wait()
        return w + 1, new_ids, state

    w, _, state = jax.lax.while_loop(
        cond,
        window_body,
        (
            jnp.int32(0),
            jnp.full((RS, 2 if dual else 1), -1, jnp.int32),
            state0,
        ),
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
    ow_ref[:] = jnp.full((RS, RL), 1, jnp.int32) * w


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "k_steps", "max_windows", "interpret",
        "bounds", "nb", "bend", "step", "min_bright", "has_absorb",
        "n_tiles", "precision", "ablate", "anchor2x", "record_path", "dual",
    ),
)
def _march_call_lines(
    table, px, py, pz, dx, dy, dz, rem, alive, br,
    *, budget, k_steps, max_windows, interpret, bounds, nb, bend, step,
    min_bright, has_absorb, n_tiles, precision, ablate="", anchor2x=False,
    record_path=False, dual=False,
):
    kernel = functools.partial(
        _march_kernel_lines,
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
        anchor2x=anchor2x,
        record_path=record_path,
        dual=dual,
    )
    n = n_tiles * R
    state_spec = pl.BlockSpec((RS, RL), lambda t: (t, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    f32s = jax.ShapeDtypeStruct((n // RL, RL), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n // RL, RL), jnp.int32)
    out_specs = [state_spec] * 10
    out_shape = [f32s] * 6 + [i32s, i32s, f32s, i32s]
    nslots = 2 if dual else 1
    nrows = 66 if anchor2x else 33  # corner-row materialisation scratch
    scratch = [
        pltpu.VMEM((nslots * RS, LS, LL), jnp.float32),
        pltpu.VMEM((nrows, RS, RL), jnp.float32),
        pltpu.SemaphoreType.DMA((nslots * RS,)),
    ]
    if record_path:
        # per-window position snapshots, unscrambled to per-ray paths by
        # the driver (march_lines record_path docstring)
        out_specs = out_specs + [any_spec]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct(
                (n_tiles, max_windows, k_steps, 3, RS, RL), jnp.float32
            )
        ]
        scratch = [
            scratch[0],
            scratch[1],
            pltpu.VMEM((k_steps, 3, RS, RL), jnp.float32),
            scratch[2],
            pltpu.SemaphoreType.DMA,
        ]
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # line table stays in HBM
            *[state_spec] * 9,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # NOTE: do NOT raise vmem_limit_bytes here — measured 3x SLOWER
        # across the board at 64 MiB (probe_r5_dual round 2); the default
        # scoped budget's pressure produces the better schedule
        interpret=interpret,
    )
    return call(table, px, py, pz, dx, dy, dz, rem, alive, br)


def _sort_by_line_brick(pos, nb, valid):
    """One locality sort by line-brick id; returns (order, inverse)."""
    cells = jnp.asarray(
        [c * b for c, b in zip(nb, (LBX, LBY, LBZ))], jnp.int32
    )
    cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, cells - 1)
    b = cell // jnp.asarray([LBX, LBY, LBZ], jnp.int32)
    brick = (b[:, 0] * nb[1] + b[:, 1]) * nb[2] + b[:, 2]
    brick = jnp.where(valid, brick, DEAD_ID)
    order = jnp.argsort(brick)
    return order, jnp.argsort(order)


def march_lines(
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
    init_state: Optional[dict] = None,
    anchor2x: Optional[bool] = None,
    record_path: bool = False,
    dual: Optional[bool] = None,
    unscramble: bool = True,
    _ablate: str = "",
) -> TraceResult:
    """Forward float march using the line-walking kernel.

    Same contract as ``march_pallas`` (semantics of ``ops.march.march_float``
    with ``opaque_when_positive=True``); ``table``/``nb`` must come from
    ``build_line_table``.

    ``record_path=True`` additionally returns per-ray step paths
    (``TraceResult.path``, (N, budget, 3): entry 0 = start position, then
    the position after each executed step, back-filled with the end
    position — the reference's ``trace_path`` contract,
    /root/reference/src/cuda_volume_raytracer.cu:333,348-358).  In-kernel
    implementation: every window DMAs a (k_steps, 3, 8, 128) snapshot
    buffer to HBM (stalled lanes repeat their position; an executed step
    always moves a ray, so the host driver recovers each ray's path by
    dropping consecutive duplicates).  The raw buffer is
    max_windows × k_steps × 12 KB per ray tile — a debug feature for
    moderate batch/budget sizes; the driver raises beyond ~4 GB (pass a
    smaller ``max_windows``).

    ``init_state``: optional ``{"remaining", "alive", "brightness"}`` dict
    (the raw dict a previous ``return_state=True`` call returned) that seeds
    the per-ray budget/liveness/brightness instead of a fresh start — the
    "ray state is a checkpoint" property (SURVEY.md §5): a march can be
    paused (``max_windows`` cap), its survivors re-sorted by current brick
    for coherence, and resumed.  ``start_position``/``start_direction`` are
    then the previous call's end state.
    """
    assert packed.ndim == 4 and packed.shape[-1] == 4, "3D packed field required"
    if dual is None:
        dual = DUAL_FWD_DEFAULT
    if anchor2x is None:
        anchor2x = ANCHOR2X_DEFAULT
    # the nogather/nozsel ablation branches bind only the 1-cell chv rows;
    # running them with the 2x anchor would NameError at trace time (and
    # with dual residency their brick_ref indexing is meaningless)
    assert not (
        (anchor2x or dual) and ("nogather" in _ablate or "nozsel" in _ablate)
    ), "ablate='nogather'/'nozsel' requires anchor2x=False, dual=False"
    assert not (dual and "dots2" in _ablate), "ablate='dots2' requires dual=False"
    n_in, dim = start_position.shape
    assert dim == 3
    bounds = tuple(int(s) for s in packed.shape[:-1])
    bend = tuple(float(b) for b in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,)))
    step = tuple(float(s) for s in np.broadcast_to(np.asarray(step_scale, np.float32), (3,)))

    if table is None:
        table, nb = build_line_table(packed, translucency, absorb=absorb)
    assert nb is not None
    has_absorb = translucency is not None or absorb is not None

    n = -(-n_in // R) * R
    pad = n - n_in
    pos = jnp.pad(start_position.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        start_direction.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0
    )
    if init_state is not None:
        alive = jnp.pad(init_state["alive"].astype(jnp.int32), (0, pad))
        rem = jnp.pad(init_state["remaining"].astype(jnp.int32), (0, pad))
        br = jnp.pad(init_state["brightness"].astype(jnp.float32), (0, pad))
    else:
        alive = jnp.concatenate(
            [jnp.ones((n_in,), jnp.int32), jnp.zeros((pad,), jnp.int32)]
        )
        # budget-1: see march_pallas (start path entry, .cu:333)
        rem = jnp.full((n,), budget - 1, jnp.int32)
        br = jnp.ones((n,), jnp.float32)
    if sort_rays:
        order, inv = _sort_by_line_brick(pos, nb, alive != 0)
        pos, dirs, alive, rem, br = (
            pos[order], dirs[order], alive[order], rem[order], br[order]
        )
    else:
        inv = None

    if max_windows is None:
        max_windows = 2 * budget + 64
    if record_path:
        path_bytes = (n // R) * max_windows * k_steps * 3 * R * 4
        if path_bytes > 4 << 30:
            raise ValueError(
                f"record_path buffer would need {path_bytes/2**30:.1f} GiB "
                f"({n} rays x {max_windows} windows x {k_steps} steps); "
                "reduce the batch/budget or pass a smaller max_windows"
            )

    rows = n // RL
    outs = _march_call_lines(
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
        anchor2x=anchor2x, record_path=record_path, dual=dual,
    )
    raw_path = outs[10] if record_path else None
    windows_used = outs[9][:: R // RL, 0]
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
    remaining_light = jnp.where(
        br >= 1.0,
        jnp.uint32(0xFFFFFFFF),
        (br * BRIGHT_MAX_F).astype(jnp.uint32),
    )
    path = None
    if record_path:
        if unscramble:
            path = _unscramble_path(
                raw_path, windows_used, pos, budget,
                None if inv is None else np.asarray(inv), n_in,
            )
        else:
            # raw device-array form — jit/custom_vjp-safe; the caller
            # unscrambles on the host (``unscramble_path``)
            path = PathRecording(raw_path, pos, inv, windows_used)
    result = TraceResult(
        end_position=end_pos,
        end_direction=end_dir,
        end_iteration=end_iteration,
        remaining_light=remaining_light,
        path=path,
        windows_used=windows_used,
    )
    if return_state:
        return result, {"remaining": rem, "alive": alive, "brightness": br}
    return result


def _unscramble_path(raw, windows_used, start_sorted, budget, inv, n_in):
    """(T, MW, K, 3, RS, RL) window snapshots → (n_in, budget+1, 3) per-ray
    paths (host-side, numpy — debug feature): row 0 = start, row t =
    position after step t, back-filled with the end position — the XLA
    march's record_path contract.  Consecutive-duplicate positions are
    stalls (an executed step always moves a ray)."""
    raw = np.asarray(raw)
    T, MW, K = raw.shape[:3]
    wu = np.asarray(windows_used)
    start = np.asarray(start_sorted)  # (T·R, 3), sorted order
    out = np.zeros((T * R, budget + 1, 3), np.float32)
    for t in range(T):
        w = int(wu[t])
        # (w·K, 3, RS, RL) → (RS·RL, w·K, 3), chronological per ray
        seq = np.transpose(raw[t, :w].reshape(w * K, 3, RS, RL), (2, 3, 0, 1))
        seq = seq.reshape(R, w * K, 3)
        s0 = start[t * R : (t + 1) * R]
        prev = np.concatenate([s0[:, None], seq[:, :-1]], axis=1)
        moved = np.any(seq != prev, axis=-1)  # (R, w·K)
        # vectorised per-row compaction (the round-4 version looped over
        # rays in python): each kept point's destination row index is the
        # running count of moved steps; a row-indexed scatter places them,
        # then a cummax-style forward fill back-fills the tail with the
        # end position
        dest = np.cumsum(moved, axis=1)  # (R, w·K) in [0, budget']
        dest = np.where(moved, dest, 0)
        dest = np.minimum(dest, budget)  # clip overlong marches
        rows = out[t * R : (t + 1) * R]
        rows[:, 0] = s0
        ridx = np.broadcast_to(np.arange(R)[:, None], moved.shape)
        # later duplicates at clipped dest==budget overwrite; fine (tail)
        rows[ridx[moved], dest[moved]] = seq[moved]
        # back-fill: positions after the last executed step repeat it
        m_count = np.minimum(moved.sum(axis=1), budget)  # (R,)
        tail = np.arange(budget + 1)[None] > m_count[:, None]
        last = rows[np.arange(R), m_count]  # (R, 3)
        rows[tail] = np.broadcast_to(last[:, None], rows.shape)[tail]
    if inv is not None:
        out = out[inv]
    return out[:n_in]


# ---------------------------------------------------------------------------
# backward (reverse-replay adjoint) — line-table variant of march_bwd
# ---------------------------------------------------------------------------


def _bwd_kernel_lines(
    # inputs
    table_ref,  # (NB, LS, LL) f32 ANY/HBM — forward line table
    gin_ref,  # (NB, GLS, LL) f32 ANY/HBM — zeros, aliased to gout_ref
    px_ref, py_ref, pz_ref,
    vx_ref, vy_ref, vz_ref,
    rrem_ref,
    apx_ref, apy_ref, apz_ref,
    avx_ref, avy_ref, avz_ref,
    # outputs
    gout_ref,  # (NB, GLS, LL) f32 ANY/HBM — line-major point-grad table
    oax_ref, oay_ref, oaz_ref,
    obx_ref, oby_ref, obz_ref,
    orx_ref, ory_ref, orz_ref,
    ow_ref,
    # scratch
    brick_ref,  # (nslots·RS, LS, LL)
    gbrick_ref,  # (nslots·RS, GLS, LL) per-slot grad accumulators (line rows)
    tmp_ref,  # (1, GLS, LL) RMW staging
    chvm_ref,  # (48, RS, RL) corner-row materialisation scratch
    dma_sem, g_sem,
    *,
    max_windows: int,
    k_steps: int,
    nb: Tuple[int, int, int],
    bend: Tuple[float, float, float],
    step: Tuple[float, float, float],
    precision,
    ablate: str = "",
    anchor2x: bool = False,
    dual: bool = False,
):
    ex, ey, ez = (jnp.float32(b) for b in bend)
    sx, sy, sz = (jnp.float32(s) for s in step)
    nbx, nby, nbz = (jnp.int32(v) for v in nb)
    nblk = 6 if anchor2x else 4
    nslots = 2 if dual else 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (LL, nblk * RL), 0)

    gbrick_ref[:] = jnp.zeros((nslots * RS, GLS, LL), jnp.float32)

    def _flush(s, brick_id):
        """Serialized RMW-accumulate of slot s's line-row grads into HBM —
        no corner roll-fold needed: the rows already address brick points.
        ``s`` indexes the flat (nslots·RS) accumulator array."""
        rd = pltpu.make_async_copy(
            gout_ref.at[pl.ds(brick_id, 1)], tmp_ref, g_sem
        )
        rd.start()
        rd.wait()
        tmp_ref[0] = tmp_ref[0] + gbrick_ref[s]
        wr = pltpu.make_async_copy(
            tmp_ref, gout_ref.at[pl.ds(brick_id, 1)], g_sem
        )
        wr.start()
        wr.wait()
        gbrick_ref[s] = jnp.zeros((GLS, LL), jnp.float32)

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

        # reverse candidate anchors the window (see march_bwd)
        ilen0 = 1.0 / (vx * vx + vy * vy + vz * vz)
        cx = px - vx * sx * ilen0
        cy = py - vy * sy * ilen0
        cz = pz - vz * sz * ilen0
        fpx = jnp.floor(cx)
        fpy = jnp.floor(cy)
        fpz = jnp.floor(cz)
        cbx = jnp.clip(fpx.astype(jnp.int32) // LBX, 0, nbx - 1)
        cby = jnp.clip(fpy.astype(jnp.int32) // LBY, 0, nby - 1)
        cbz = jnp.clip(fpz.astype(jnp.int32) // LBZ, 0, nbz - 1)
        ids = (cbx * nby + cby) * nbz + cbz
        ids = jnp.where(live, ids, DEAD_ID)
        if dual:
            # dual-brick residency (see the forward kernel's scheduler):
            # per-sublane grad accumulators are per SLOT; an eviction
            # flushes the outgoing slot's accumulator before the new
            # brick's DMA lands in it
            cont0 = prev_ids[:, 0:1]
            cont1 = prev_ids[:, 1:2]
            need_a = jnp.min(ids, axis=1, keepdims=True)
            ids_b = jnp.where(ids == need_a, DEAD_ID, ids)
            need_b = jnp.min(ids_b, axis=1, keepdims=True)
            vA = need_a != DEAD_ID
            vB = need_b != DEAD_ID
            hitA = (need_a == cont0) | (need_a == cont1)
            hitB = (need_b == cont0) | (need_b == cont1)
            destA = jnp.where(hitB & (cont0 == need_b), 1, 0)
            slotA = jnp.where(hitA, jnp.where(cont0 == need_a, 0, 1), destA)
            placeA = (~hitA) & vA
            destB = 1 - slotA
            placeB = (~hitB) & vB
            recvA = [
                (placeA & (destA == j)).astype(jnp.int32) for j in (0, 1)
            ]
            recvB = [
                (placeB & (destB == j)).astype(jnp.int32) for j in (0, 1)
            ]

            @pl.when(jnp.any(placeA | placeB))
            def _():
                # flush evicted slots first (serialized RMW)
                for s in range(RS):
                    for j in range(2):
                        @pl.when(
                            ((recvA[j][s, 0] != 0) | (recvB[j][s, 0] != 0))
                            & (prev_ids[s, j] >= 0)
                        )
                        def _(s=s, j=j):
                            _flush(2 * s + j, prev_ids[s, j])
                for s in range(RS):
                    for j in range(2):
                        @pl.when(recvA[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_a[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).start()
                        @pl.when(recvB[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_b[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).start()
                for s in range(RS):
                    for j in range(2):
                        @pl.when(recvA[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_a[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).wait()
                        @pl.when(recvB[j][s, 0] != 0)
                        def _(s=s, j=j):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(need_b[s, 0], 1)],
                                brick_ref.at[pl.ds(2 * s + j, 1)],
                                dma_sem.at[2 * s + j],
                            ).wait()

            ncont0 = jnp.where(placeA & (destA == 0), need_a, cont0)
            ncont0 = jnp.where(placeB & (destB == 0), need_b, ncont0)
            ncont1 = jnp.where(placeA & (destA == 1), need_a, cont1)
            ncont1 = jnp.where(placeB & (destB == 1), need_b, ncont1)
            new_ids = jnp.concatenate([ncont0, ncont1], axis=1)
            in_s0 = live & (ids == jnp.broadcast_to(ncont0, (RS, RL)))
            in_s1 = live & (ids == jnp.broadcast_to(ncont1, (RS, RL)))
            in_cur = in_s0 | in_s1
            org = ids
        else:
            cur_min = jnp.min(ids, axis=1, keepdims=True)
            changed_v = cur_min != prev_ids

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
            new_ids = cur_min  # DEAD adopted — its flush already ran

            cur_col = jnp.broadcast_to(cur_min, (RS, RL))
            in_cur = live & (ids == cur_col)
            org = cur_col

        b2 = org // nbz
        oxf = ((b2 // nby) * LBX).astype(jnp.float32)
        oyf = ((b2 % nby) * LBY).astype(jnp.float32)
        ozf = ((org % nbz) * LBZ).astype(jnp.float32)
        lx = jnp.clip((fpx - oxf).astype(jnp.int32), 0, LBX - 1)
        ly = jnp.clip((fpy - oyf).astype(jnp.int32), 0, LBY - 1)
        lz = jnp.clip((fpz - ozf).astype(jnp.int32), 0, LBZ - 1)
        if anchor2x:
            # reverse marching direction is −v: bias the 2-cell slab one
            # cell upstream of it (see the forward kernel's anchor comment)
            base_lx = jnp.clip(
                lx - (vx > 0.0).astype(jnp.int32), 0, LBX - 2
            )
            lin = base_lx * LPY + ly
            basex_a = oxf + base_lx.astype(jnp.float32)
        else:
            lin = lx * LPY + ly
            basex_a = fpx

        # gather (identical to the forward refresh); the one-hots are
        # REBUILT at scatter time rather than kept live across the step loop
        lines_fn = _corner_lines2x if anchor2x else _corner_lines
        parts = []
        for s in range(RS):
            onehot = (iota == lines_fn(lin[s : s + 1, :])).astype(
                jnp.float32
            )
            if dual:
                parts.append(tuple(
                    jax.lax.dot_general(
                        brick_ref[2 * s + j],
                        onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    for j in (0, 1)
                ))
            else:
                parts.append(
                    jax.lax.dot_general(
                        brick_ref[s],
                        onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                )
        lz4 = jnp.concatenate([lz] * nblk, axis=1)
        if dual:
            # corner-row-level merge (see the forward kernel: a G-level
            # merge materializes an extra (LS, RS, nblk·RL) and spills)
            Ga = jnp.stack([p[0] for p in parts], axis=1)
            Gb = jnp.stack([p[1] for p in parts], axis=1)
            acc0a, acc1a = _zselect(Ga, lz4)
            acc0b, acc1b = _zselect(Gb, lz4)

            def bmerge(a, b):
                return jnp.where(in_s1, b, a)

            if anchor2x:
                lo_a, hi_a, _, _ = _corner_channels2x(acc0a, acc1a)
                lo_b, hi_b, _, _ = _corner_channels2x(acc0b, acc1b)
                chv_lo = [
                    [bmerge(lo_a[o][c], lo_b[o][c]) for c in range(NLO)]
                    for o in range(8)
                ]
                chv_hi = [
                    [bmerge(hi_a[o][c], hi_b[o][c]) for c in range(NLO)]
                    for o in range(8)
                ]
            else:
                ca, _ = _corner_channels(acc0a, acc1a)
                cb, _ = _corner_channels(acc0b, acc1b)
                chv = [
                    [bmerge(ca[o][c], cb[o][c]) for c in range(NLO)]
                    for o in range(8)
                ]
        else:
            G = jnp.stack(parts, axis=1)  # (LS, RS, nblk·RL)
            acc0, acc1 = _zselect(G, lz4)
            if anchor2x:
                chv_lo_f, chv_hi_f, _, _ = _corner_channels2x(acc0, acc1)
                chv_lo = [rows[:NLO] for rows in chv_lo_f]
                chv_hi = [rows[:NLO] for rows in chv_hi_f]
            else:
                chv_full, _ = _corner_channels(acc0, acc1)
                chv = [rows[:NLO] for rows in chv_full]  # the 3 grad rows

        basex, basey, basez = basex_a, fpy, fpz
        evaluable_w = in_cur
        xlim = 2.0 if anchor2x else 1.0

        # corner-row materialisation — opt-IN for the adjoint (unlike the
        # forward): the dC accumulators stay loop-carried regardless, so
        # the extra per-step loads measured -5% (probe_r5_bwd_dual nomat
        # vs mat, same run)
        mat = "mat" in ablate
        if mat:
            if anchor2x:
                for o in range(8):
                    for c in range(NLO):
                        chvm_ref[o * NLO + c] = chv_lo[o][c]
                        chvm_ref[24 + o * NLO + c] = chv_hi[o][c]
            else:
                for o in range(8):
                    for c in range(NLO):
                        chvm_ref[o * NLO + c] = chv[o][c]

        zero = jnp.zeros((RS, RL), jnp.float32)
        # corner/point grads: 12 slab points in 2x ((dxi*2+dy)*2+dz layout),
        # 8 corners otherwise ([o*3+c] layout)
        n_pts = 12 if anchor2x else 8
        dC = [zero] * (n_pts * 3)

        def step_body(k, carry):
            (px, py, pz, vx, vy, vz, ax, ay, az, bx, by, bz, rrem, dC) = carry
            if mat:
                if anchor2x:
                    chv_lo_l = [
                        [chvm_ref[o * NLO + c] for c in range(NLO)]
                        for o in range(8)
                    ]
                    chv_hi_l = [
                        [chvm_ref[24 + o * NLO + c] for c in range(NLO)]
                        for o in range(8)
                    ]
                else:
                    chv_l = [
                        [chvm_ref[o * NLO + c] for c in range(NLO)]
                        for o in range(8)
                    ]
            else:
                if anchor2x:
                    chv_lo_l, chv_hi_l = chv_lo, chv_hi
                else:
                    chv_l = chv
            ilen = 1.0 / (vx * vx + vy * vy + vz * vz)
            candx = px - vx * sx * ilen
            candy = py - vy * sy * ilen
            candz = pz - vz * sz * ilen
            fx = candx - basex
            fy = candy - basey
            fz = candz - basez
            crossed = (
                (fx < 0) | (fx >= xlim) | (fy < 0) | (fy >= 1.0) | (fz < 0) | (fz >= 1.0)
            )
            ok = evaluable_w & ~crossed & (rrem > 0)

            if anchor2x:
                sel = fx >= 1.0
                self_ = jnp.where(sel, 1.0, 0.0)
                fxl = jnp.where(sel, fx - 1.0, fx)
            else:
                fxl = fx

            gx_ = 1.0 - fxl
            gy_ = 1.0 - fy
            gz_ = 1.0 - fz
            wts = (
                gx_ * gy_ * gz_, gx_ * gy_ * fz, gx_ * fy * gz_, gx_ * fy * fz,
                fxl * gy_ * gz_, fxl * gy_ * fz, fxl * fy * gz_, fxl * fy * fz,
            )
            yz = (gy_ * gz_, gy_ * fz, fy * gz_, fy * fz)
            dwx = (-yz[0], -yz[1], -yz[2], -yz[3], yz[0], yz[1], yz[2], yz[3])
            xz = (gx_ * gz_, gx_ * fz, fxl * gz_, fxl * fz)
            dwy = (-xz[0], -xz[1], xz[0], xz[1], -xz[2], -xz[3], xz[2], xz[3])
            xy = (gx_ * gy_, gx_ * fy, fxl * gy_, fxl * fy)
            dwz = (-xy[0], xy[0], -xy[1], xy[1], -xy[2], xy[2], -xy[3], xy[3])

            if anchor2x:
                g0l = g1l = g2l = zero
                g0h = g1h = g2h = zero
                for o in range(8):
                    g0l = g0l + wts[o] * chv_lo_l[o][0]
                    g1l = g1l + wts[o] * chv_lo_l[o][1]
                    g2l = g2l + wts[o] * chv_lo_l[o][2]
                    g0h = g0h + wts[o] * chv_hi_l[o][0]
                    g1h = g1h + wts[o] * chv_hi_l[o][1]
                    g2h = g2h + wts[o] * chv_hi_l[o][2]
                g0 = jnp.where(sel, g0h, g0l)
                g1 = jnp.where(sel, g1h, g1l)
                g2 = jnp.where(sel, g2h, g2l)
            else:
                g0 = zero
                g1 = zero
                g2 = zero
                for o in range(8):
                    g0 = g0 + wts[o] * chv_l[o][0]
                    g1 = g1 + wts[o] * chv_l[o][1]
                    g2 = g2 + wts[o] * chv_l[o][2]

            nvx = vx - g0 * ex
            nvy = vy - g1 * ey
            nvz = vz - g2 * ez

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
            ndC = list(dC)
            if anchor2x:
                wlo_f = okf * (1.0 - self_)
                whi_f = okf * self_
                for dx_ in (0, 1):
                    for dy_ in (0, 1):
                        for dz_ in (0, 1):
                            o = dx_ * 4 + dy_ * 2 + dz_
                            m_l = (
                                chv_lo_l[o][0] * h0
                                + chv_lo_l[o][1] * h1
                                + chv_lo_l[o][2] * h2
                            )
                            m_h = (
                                chv_hi_l[o][0] * h0
                                + chv_hi_l[o][1] * h1
                                + chv_hi_l[o][2] * h2
                            )
                            m = jnp.where(sel, m_h, m_l)
                            Gx = Gx + dwx[o] * m
                            Gy = Gy + dwy[o] * m
                            Gz = Gz + dwz[o] * m
                            p_lo = (dx_ * 2 + dy_) * 2 + dz_
                            p_hi = ((dx_ + 1) * 2 + dy_) * 2 + dz_
                            wlo = wts[o] * wlo_f
                            whi = wts[o] * whi_f
                            ndC[p_lo * 3 + 0] = ndC[p_lo * 3 + 0] + wlo * h0
                            ndC[p_lo * 3 + 1] = ndC[p_lo * 3 + 1] + wlo * h1
                            ndC[p_lo * 3 + 2] = ndC[p_lo * 3 + 2] + wlo * h2
                            ndC[p_hi * 3 + 0] = ndC[p_hi * 3 + 0] + whi * h0
                            ndC[p_hi * 3 + 1] = ndC[p_hi * 3 + 1] + whi * h1
                            ndC[p_hi * 3 + 2] = ndC[p_hi * 3 + 2] + whi * h2
            else:
                for o in range(8):
                    m = (
                        chv_l[o][0] * h0
                        + chv_l[o][1] * h1
                        + chv_l[o][2] * h2
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
                (fx2 < 0) | (fx2 >= xlim) | (fy2 < 0) | (fy2 >= 1.0)
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
                dC,
            ),
        )

        # ---- transpose-scatter: z-SPREAD the corner grads onto line rows,
        # then one dG @ onehotᵀ per sublane (the gather's transpose) ----
        zerot = jnp.zeros((1, RS, RL), jnp.float32)

        def dblock(dz_):
            """(TCH, RS, nblk·RL): per-line channel rows of the dz grads.
            In 2x mode the 6 lane blocks are the slab's (dxi, dy) lines and
            dC is indexed by slab point ((dxi*2+dy)*2+dz)."""
            blocks = []
            xs = (0, 1, 2) if anchor2x else (0, 1)
            for dx_ in xs:
                for dy_ in (0, 1):
                    if anchor2x:
                        o = (dx_ * 2 + dy_) * 2 + dz_
                    else:
                        o = dx_ * 4 + dy_ * 2 + dz_
                    blocks.append(
                        jnp.concatenate(
                            [dC[o * 3 + c][None] for c in range(3)]
                            + [zerot] * (TCH - 3),
                            axis=0,
                        )
                    )  # (TCH, RS, RL)
            return jnp.concatenate(blocks, axis=2)  # (TCH, RS, nblk·RL)

        d0 = dblock(0)
        d1 = dblock(1)
        lz4e = lz4[None]  # (1, RS, 4RL)
        rows = []
        prev = None
        for z in range(LPZ):
            m = (lz4e == z).astype(jnp.float32)
            row = d0 * m
            if prev is not None:
                row = row + d1 * prev
            rows.append(row)
            prev = m
        dG = jnp.concatenate(rows, axis=0)  # (GLS, RS, 4RL)

        if dual:
            in0f = in_s0.astype(jnp.float32)
            in1f = in_s1.astype(jnp.float32)
        for s in range(RS):
            onehot = (iota == lines_fn(lin[s : s + 1, :])).astype(
                jnp.float32
            )
            d = dG[:, s, :]  # (GLS, nblk·RL)
            if dual:
                # a lane's grads belong to ITS brick only: mask the grad
                # rows per slot before the transpose-scatter (the one-hot is
                # shared; without the mask both slots would receive every
                # lane's contribution)
                for j, mf in ((0, in0f), (1, in1f)):
                    mj = jnp.concatenate([mf[s : s + 1]] * nblk, axis=1)
                    dj = d * mj  # (GLS, nblk·RL)
                    dhi = dj.astype(jnp.bfloat16).astype(jnp.float32)
                    dlo = dj - dhi
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
                    )  # (GLS, LL)
                    gbrick_ref[2 * s + j] = gbrick_ref[2 * s + j] + contrib
            elif "scat1" in ablate:
                # single bf16 pass (2^-8-rounded window contributions) —
                # accuracy/cost A/B probe, not the production path
                contrib = jax.lax.dot_general(
                    d, onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                gbrick_ref[s] = gbrick_ref[s] + contrib
            else:
                # runtime hi/lo split (see march_bwd: grad rows are
                # arbitrary f32; DEFAULT precision alone rounds to 2^-8)
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
                )  # (GLS, LL)
                gbrick_ref[s] = gbrick_ref[s] + contrib

        return w + 1, new_ids, tuple(state)

    w, last_ids, state = jax.lax.while_loop(
        cond,
        window_body,
        (
            jnp.int32(0),
            jnp.full((RS, 2 if dual else 1), -1, jnp.int32),
            state0,
        ),
    )
    if dual:
        for s in range(RS):
            for j in range(2):
                last_sj = last_ids[s, j]
                @pl.when((last_sj >= 0) & (last_sj != DEAD_ID))
                def _(s=s, j=j, last_sj=last_sj):
                    _flush(2 * s + j, last_sj)
    else:
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
    # sign-encoded truncation flag (see march_bwd._bwd_kernel): negative
    # -(w+1) ⇒ the replay exited with residual reverse budget
    resid = jnp.any(rrem > 0)
    ow_ref[:] = jnp.full((RS, RL), 1, jnp.int32) * jnp.where(resid, -(w + 1), w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_steps", "max_windows", "interpret", "nb", "bend", "step",
        "n_tiles", "precision", "ablate", "anchor2x", "dual",
    ),
)
def _bwd_call_lines(
    table, gzeros, px, py, pz, vx, vy, vz, rrem, apx, apy, apz, avx, avy, avz,
    *, k_steps, max_windows, interpret, nb, bend, step, n_tiles, precision,
    ablate="", anchor2x=False, dual=False,
):
    kernel = functools.partial(
        _bwd_kernel_lines,
        max_windows=max_windows,
        k_steps=k_steps,
        nb=nb,
        bend=bend,
        step=step,
        precision=precision,
        ablate=ablate,
        anchor2x=anchor2x,
        dual=dual,
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
            pltpu.VMEM(((2 if dual else 1) * RS, LS, LL), jnp.float32),
            pltpu.VMEM(((2 if dual else 1) * RS, GLS, LL), jnp.float32),
            pltpu.VMEM((1, GLS, LL), jnp.float32),
            pltpu.VMEM((48 if anchor2x else 24, RS, RL), jnp.float32),
            pltpu.SemaphoreType.DMA(((2 if dual else 1) * RS,)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )
    return call(
        table, gzeros, px, py, pz, vx, vy, vz, rrem, apx, apy, apz, avx, avy, avz
    )


def _bwd_impl_lines(
    table, nb, end_pos, end_dir, nexec, d_pos, d_dir,
    *, bend, step, k_steps, max_windows, interpret, budget,
    precision=jax.lax.Precision.DEFAULT, ablate="", anchor2x=False,
    dual=None,
):
    """Run the line-layout adjoint kernel; mirrors ``march_bwd._bwd_impl``.

    ``anchor2x`` defaults OFF for the backward: measured on chip
    (benchmarks/probe_bwd_2x.py) the 1-cell adjoint is ~24% faster than the
    2-cell slab — the dual-corner-set adjoint step body (12-point gradient
    accumulators) costs more than the wider windows save.  The FORWARD
    kernel defaults 2x (its lighter step body nets +16%); the two choices
    are independent (the adjoint replays the same trajectory regardless of
    either kernel's anchor shape)."""
    if dual is None:
        dual = DUAL_BWD_DEFAULT
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

    order, inv = _sort_by_line_brick(pos, nb, nex > 0)
    pos, dirs, ap, av, nex = (
        pos[order], dirs[order], ap[order], av[order], nex[order]
    )

    if max_windows is None:
        max_windows = 2 * budget + 64

    rows = n // RL
    gzeros = jnp.zeros((n_bricks, GLS, LL), jnp.float32)
    outs = _bwd_call_lines(
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
        ablate=ablate, anchor2x=anchor2x, dual=dual,
    )
    gtable = outs[0]
    windows_used = outs[10][:: R // RL, 0]
    tiles = [o.reshape(n)[inv][:n_in] for o in outs[1:10]]
    d_pos0 = jnp.stack(tiles[0:3], axis=-1)
    d_dir0 = jnp.stack(tiles[3:6], axis=-1)
    recon_pos = jnp.stack(tiles[6:9], axis=-1)
    return gtable, d_pos0, d_dir0, recon_pos, windows_used


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "k_steps", "phase_windows", "max_phases", "interpret",
        "bounds", "nb", "bend", "step", "min_bright", "has_absorb",
        "n_tiles", "precision", "anchor2x", "dual",
    ),
)
def _compact_loop(
    table, pos, dirs, rem, alive, br, perm,
    *, budget, k_steps, phase_windows, max_phases, interpret, bounds, nb,
    bend, step, min_bright, has_absorb, n_tiles, precision, anchor2x=True,
    dual=True,
):
    """Jitted multi-phase march: kernel for ``phase_windows`` windows →
    re-sort survivors by their CURRENT brick → repeat.  The whole loop is
    one XLA program (one dispatch), so compaction costs an on-device argsort
    per phase instead of a host round-trip."""
    n = n_tiles * R
    rows = n // RL

    def kernel_phase(pos, dirs, rem, alive, br):
        outs = _march_call_lines(
            table,
            pos[:, 0].reshape(rows, RL), pos[:, 1].reshape(rows, RL),
            pos[:, 2].reshape(rows, RL),
            dirs[:, 0].reshape(rows, RL), dirs[:, 1].reshape(rows, RL),
            dirs[:, 2].reshape(rows, RL),
            rem.reshape(rows, RL), alive.reshape(rows, RL),
            br.reshape(rows, RL),
            budget=budget, k_steps=k_steps, max_windows=phase_windows,
            interpret=interpret, bounds=bounds, nb=nb, bend=bend, step=step,
            min_bright=min_bright, has_absorb=has_absorb, n_tiles=n_tiles,
            precision=precision, anchor2x=anchor2x, dual=dual,
        )
        w = jnp.sum(outs[9][:: R // RL, 0])
        flat = [o.reshape(n) for o in outs[:9]]
        pos = jnp.stack(flat[0:3], axis=-1)
        dirs = jnp.stack(flat[3:6], axis=-1)
        return pos, dirs, flat[6], flat[7], flat[8], w

    def cond(c):
        phase, pos, dirs, rem, alive, br, perm, wtot = c
        return (phase < max_phases) & jnp.any(alive != 0)

    def body(c):
        phase, pos, dirs, rem, alive, br, perm, wtot = c
        pos, dirs, rem, alive, br, w = kernel_phase(pos, dirs, rem, alive, br)
        # compact: re-sort by the survivors' CURRENT brick
        order, _ = _sort_by_line_brick(pos, nb, alive != 0)
        return (
            phase + 1,
            pos[order], dirs[order], rem[order], alive[order], br[order],
            perm[order], wtot + w,
        )

    init = (jnp.int32(0), pos, dirs, rem, alive, br, perm, jnp.int32(0))
    phase, pos, dirs, rem, alive, br, perm, wtot = jax.lax.while_loop(
        cond, body, init
    )
    return phase, pos, dirs, rem, alive, br, perm, wtot


def march_lines_compact(
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
    phase_windows: int = 48,
    max_phases: Optional[int] = None,
    interpret: bool = False,
    precision=jax.lax.Precision.DEFAULT,
    table: Optional[jax.Array] = None,
    nb: Optional[Tuple[int, int, int]] = None,
    anchor2x: Optional[bool] = None,
    dual: bool = False,
) -> TraceResult:
    """Two-phase(+) scattered-ray march: march → compact survivors →
    continue (SURVEY.md §7's divergence mitigation), the whole loop in ONE
    jitted program.  Semantics identical to ``march_lines``; rays are
    re-binned to tiles by their current brick every ``phase_windows``
    windows, so a scattered batch regains sublane coherence as it marches
    (the min-brick scheduler otherwise serializes a sublane whose 128 rays
    spread over many bricks — measured 0.11-0.13 window-step efficiency vs
    0.46 sorted, benchmarks/perf_notes.md).

    ``dual`` defaults OFF here, opposite to ``march_lines``: scattered
    sublanes span MANY bricks, so the second resident slot doubles DMA
    churn and window cost without covering more lanes — measured 0.099 vs
    0.066 Gsteps/s on fully random rays (benchmarks/probe_r5_scattered.py;
    with k_steps=16 the single-residency compact path reaches 0.118)."""
    assert packed.ndim == 4 and packed.shape[-1] == 4
    n_in, dim = start_position.shape
    assert dim == 3
    bounds = tuple(int(s) for s in packed.shape[:-1])
    bend = tuple(float(b) for b in np.broadcast_to(np.asarray(bend_scale, np.float32), (3,)))
    step = tuple(float(s) for s in np.broadcast_to(np.asarray(step_scale, np.float32), (3,)))
    if table is None:
        table, nb = build_line_table(packed, translucency, absorb=absorb)
    assert nb is not None
    has_absorb = translucency is not None or absorb is not None
    if anchor2x is None:
        anchor2x = ANCHOR2X_DEFAULT

    n = -(-n_in // R) * R
    pad = n - n_in
    pos = jnp.pad(start_position.astype(jnp.float32), ((0, pad), (0, 0)))
    dirs = jnp.pad(
        start_direction.astype(jnp.float32), ((0, pad), (0, 0)),
        constant_values=1.0,
    )
    alive = jnp.concatenate(
        [jnp.ones((n_in,), jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    rem = jnp.full((n,), budget - 1, jnp.int32)
    br = jnp.ones((n,), jnp.float32)
    perm = jnp.arange(n, dtype=jnp.int32)
    if max_phases is None:
        max_phases = -(-(2 * budget + 64) // phase_windows)

    phase, pos, dirs, rem, alive, br, perm, wtot = _compact_loop(
        table, pos, dirs, rem, alive, br, perm,
        budget=budget, k_steps=k_steps, phase_windows=int(phase_windows),
        max_phases=int(max_phases), interpret=interpret, bounds=bounds,
        nb=nb, bend=bend, step=step,
        min_bright=float(minimum_brightness) / BRIGHT_MAX_F,
        has_absorb=has_absorb, n_tiles=n // R, precision=precision,
        anchor2x=anchor2x, dual=dual,
    )
    inv = jnp.argsort(perm)
    pos, dirs, rem, alive, br = (
        pos[inv][:n_in], dirs[inv][:n_in], rem[inv][:n_in],
        alive[inv][:n_in], br[inv][:n_in],
    )
    end_remaining = jnp.where(alive != 0, 0, rem).astype(jnp.uint32)
    return TraceResult(
        end_position=pos,
        end_direction=dirs,
        end_iteration=jnp.uint32(budget) - end_remaining,
        remaining_light=jnp.where(
            br >= 1.0, jnp.uint32(0xFFFFFFFF),
            (br * BRIGHT_MAX_F).astype(jnp.uint32),
        ),
        path=None,
        windows_used=wtot[None],
    )
