"""Pallas kernels for the line-table build and gradient fold.

The XLA implementations (``line_table.build_line_table`` /
``fold_line_grads``) cost ~30 + ~20 ms per 256³ train step — ~20% of the
fused step — although their HBM traffic at roofline is ~2 + ~3 ms: the cost
is XLA's handling of the final (72 × 121) per-brick transpose
(benchmarks/perf_notes.md, VERDICT r4 item 3).  These kernels do the
relayout explicitly:

build (grid point = one (bx, by) brick COLUMN, all nbz z-bricks):
  1.  DMA the column's source window ``F[x0:x0+LPX, y0:y0+16, :]`` from the
      hi/lo-split channel-flattened field ``F`` of shape
      (X1, Y1p, ZC = (CZ+1)·TCH) — the y-window is padded 11 → 16 to satisfy
      the 8-sublane DMA alignment rule.
  2.  Reshape the live (LPX, LPY, ZC) window to lines (121, ZC), gather the
      nbz overlapping 72-row z-windows into one (121, nbz·72) block, and
      TRANSPOSE ONCE per column — the hot relayout, one big XU transpose
      instead of XLA's strided copies.
  3.  DMA each brick's (72, 128) slice of the transposed block to
      ``table[b]``; the per-brick copies pipeline against the next column's
      compute (one semaphore per z-brick).

fold = the exact adjoint: bricks → one transpose → overlap-add into the
column window → serialized read-modify-write accumulate into the padded
field-gradient buffer (grid programs run sequentially on the core, so the
±1-point x/y halo overlap between neighbouring columns is race-free).

Parity: ``tests/test_line_table_pallas.py`` asserts exact equality with the
XLA build and allclose adjoint round-trip on CPU (interpret mode) — and the
on-chip verify gate covers the production path.

Reference anchor: this table plays the role of the CUDA texture upload
(/root/reference/src/cuda_volume_raytracer.cu:670-719); the reference
uploads per device once, we rebuild per optimizer step because the field
is being TRAINED (a capability the reference does not have).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .march_pallas import LCH, NLO, TCH, _overlap_windows
from .line_table import (
    LBX,
    LBY,
    LBZ,
    LL,
    LPX,
    LPY,
    LPZ,
    LS,
    NLINES,
    line_brick_grid,
)

YW = 16  # padded y-window (LPY=11 → 16): 8-sublane DMA alignment


def _split_field(packed, absorb, has_absorb, nb):
    """XLA preprocessing shared by build paths: pad to the brick grid,
    bf16 hi/lo split, flatten (z, c) → one lane axis.  Elementwise +
    reshape only — runs at memory speed."""
    X, Y, Z, C = packed.shape
    nbx, nby, nbz = nb
    CX, CY, CZ = nbx * LBX, nby * LBY, nbz * LBZ
    packed_p = jnp.pad(
        packed, ((0, CX + 1 - X), (0, CY + 1 - Y), (0, CZ + 1 - Z), (0, 0))
    )
    if not has_absorb:
        absorb = jnp.zeros((1, 1, 1), jnp.float32)
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
    t = jnp.concatenate([hi, lo], axis=-1)  # (CX+1, CY+1, CZ+1, TCH)
    # flatten (z, c); pre-window the y axis in XLA (dense overlap windows —
    # cheap) into per-column 16-row bands: Mosaic DMA slices on the tiled
    # sublane dim must be 8-aligned, and a raw 10·by offset is not, so the
    # kernel slices only the untiled leading dims (x, by)
    F = t.reshape(CX + 1, CY + 1, (CZ + 1) * TCH)
    F = _overlap_windows(F, 1, LBY, LPY)  # (CX+1, nby, LPY, ZC)
    # pad y-window 11 → 16 (8-sublane rule) and the lane axis to a multiple
    # of 128 (lane-slice alignment rule) so the kernel's DMAs slice only
    # untiled leading dims
    ZC = F.shape[-1]
    ZCp = -(-ZC // 128) * 128
    F = jnp.pad(F, ((0, 0), (0, 0), (0, YW - LPY), (0, ZCp - ZC)))
    return F


def _build_kernel(F_ref, out_ref, slab_ref, stage_ref, in_sem, out_sem, *,
                  nby: int, nbz: int, ncols: int, cb: int):
    """Double-buffered column pipeline: column i's compute overlaps column
    i+1's input DMA, and column i's output DMAs are waited only when their
    stage slot is about to be reused (column i+2) — the serialized
    start→wait pattern measured ~25 µs of pure DMA latency per column
    (~16× the traffic roofline of this kernel)."""
    p = pl.program_id(0)

    def start_in(col, slot):
        bx = col // nby
        by = col % nby
        return pltpu.make_async_copy(
            F_ref.at[pl.ds(bx * LBX, LPX), pl.ds(by, 1)],
            slab_ref.at[slot],
            in_sem.at[slot],
        )

    @pl.when(p * cb < ncols)
    def _():
        start_in(p * cb, 0).start()

    for i in range(cb):
        col = p * cb + i
        slot = i % 2

        @pl.when(col < ncols)
        def _(col=col, slot=slot, i=i):
            nxt = col + 1

            if i + 1 < cb:  # the next program's prologue handles ITS first
                @pl.when(nxt < ncols)
                def _():
                    start_in(nxt, (slot + 1) % 2).start()

            start_in(col, slot).wait()

            ZC = slab_ref.shape[-1]
            slab = slab_ref[slot, :, 0, :LPY, :]  # (LPX, LPY, ZC)
            lines = slab.reshape(NLINES, ZC)  # (121, ZC): row = px·LPY + py
            # ONE whole-column MXU transpose (identity matmul, exact at
            # HIGHEST), THEN slice the overlapping z-windows in the
            # SUBLANE dim — offsets 64·bz are 8-aligned, whereas lane
            # slices at 64·bz offsets force lane-rotation slow paths
            eye = jnp.eye(NLINES, dtype=jnp.float32)
            T_all = jax.lax.dot_general(
                lines, eye,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (ZC, 121)
            T = jnp.concatenate(
                [
                    T_all[LBZ * TCH * bz : LBZ * TCH * bz + LS]
                    for bz in range(nbz)
                ],
                axis=0,
            )  # (nbz·LS, 121)

            # before reusing this stage slot, retire its previous column's
            # output DMA
            @pl.when(i >= 2)
            def _():
                prev = col - 2
                pltpu.make_async_copy(
                    stage_ref.at[slot],
                    out_ref.at[pl.ds(prev * nbz, nbz)],
                    out_sem.at[slot, 0],
                ).wait()

            stage_ref[slot, :, :, :NLINES] = T.reshape(nbz, LS, NLINES)
            stage_ref[slot, :, :, NLINES:] = jnp.zeros(
                (nbz, LS, LL - NLINES), jnp.float32
            )
            # ONE DMA for the whole column: its nbz bricks are contiguous
            # in the table (base = col·nbz) — 32 separate 36 KB DMAs per
            # column cost ~1.5 µs of issue overhead EACH (~30 ms across
            # the 676 columns, the measured kernel wall)
            pltpu.make_async_copy(
                stage_ref.at[slot],
                out_ref.at[pl.ds(col * nbz, nbz)],
                out_sem.at[slot, 0],
            ).start()

    # retire the still-in-flight output DMAs.  Column i is retired by the
    # main loop only if iteration i+2 runs IN THIS PROGRAM with a valid
    # column; unretired are therefore i >= cb-2 (always) plus tail columns
    # whose col+2 crosses ncols.
    for i in range(cb):
        col = p * cb + i
        slot = i % 2
        if i >= cb - 2:
            cond = col < ncols
        else:
            cond = (col < ncols) & (col + 2 >= ncols)

        @pl.when(cond)
        def _(col=col, slot=slot):
            pltpu.make_async_copy(
                stage_ref.at[slot],
                out_ref.at[pl.ds(col * nbz, nbz)],
                out_sem.at[slot, 0],
            ).wait()


#: brick columns per grid program — the per-program pipeline overhead
#: measured ~40-50 us (benchmarks/probe_r5_fixed.py max_windows scaling and
#: the 49 us/program build cost vs its ~8 us of DMA+transpose work);
#: batching amortises it
COLS_PER_PROGRAM = 16


@functools.partial(jax.jit, static_argnames=("has_absorb", "nb", "interpret"))
def _build_line_table_pallas_jit(packed, absorb, *, has_absorb, nb, interpret):
    nbx, nby, nbz = nb
    F = _split_field(packed, absorb, has_absorb, nb)
    ZC = F.shape[-1]
    ncols = nbx * nby
    cb = min(COLS_PER_PROGRAM, ncols)
    kernel = functools.partial(
        _build_kernel, nby=nby, nbz=nbz, ncols=ncols, cb=cb
    )
    out = pl.pallas_call(
        kernel,
        grid=(-(-ncols // cb),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nbx * nby * nbz, LS, LL), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, LPX, 1, YW, ZC), jnp.float32),
            pltpu.VMEM((2, nbz, LS, LL), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, nbz)),
        ],
        interpret=interpret,
    )(F)
    return out


def build_line_table_pallas(
    packed: jax.Array,
    translucency: Optional[jax.Array] = None,
    *,
    absorb: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Tuple[int, int, int]]:
    """Pallas-kernel variant of ``line_table.build_line_table`` — identical
    output table (same addressing, same hi/lo channel encoding)."""
    from .march_pallas import absorption_fraction

    assert packed.shape[-1] == 4
    nb = line_brick_grid(packed.shape)
    if translucency is not None:
        assert absorb is None
        absorb = absorption_fraction(translucency)
    has = absorb is not None
    if absorb is None:
        absorb = jnp.zeros((1, 1, 1), jnp.float32)
    return (
        _build_line_table_pallas_jit(
            packed, absorb, has_absorb=has, nb=nb, interpret=interpret
        ),
        nb,
    )


def _fold_kernel(g_ref, out_ref, gstage_ref, lines_ref, in_sem, out_sem, *,
                 nbz: int, ncols: int, cb: int):
    """Double-buffered column pipeline (mirror of the build kernel): DMA
    the next column's gradient bricks while folding the current one, and
    retire output DMAs lazily."""
    p = pl.program_id(0)

    def in_dma(col, slot):
        # one contiguous DMA per column (bricks base = col·nbz are
        # adjacent in the gradient table) — see the build kernel
        return pltpu.make_async_copy(
            g_ref.at[pl.ds(col * nbz, nbz)],
            gstage_ref.at[slot],
            in_sem.at[slot, 0],
        )

    def start_in(col, slot):
        in_dma(col, slot).start()

    def wait_in(col, slot):
        in_dma(col, slot).wait()

    def out_dma(col, slot):
        return pltpu.make_async_copy(
            lines_ref.at[slot], out_ref.at[pl.ds(col, 1)], out_sem.at[slot]
        )

    @pl.when(p * cb < ncols)
    def _():
        start_in(p * cb, 0)

    for i in range(cb):
        col = p * cb + i
        slot = i % 2

        @pl.when(col < ncols)
        def _(col=col, slot=slot, i=i):
            if i + 1 < cb:  # next program's prologue handles its own first
                @pl.when(col + 1 < ncols)
                def _():
                    start_in(col + 1, (slot + 1) % 2)

            wait_in(col, slot)

            ZCp = lines_ref.shape[-1]
            gst = gstage_ref[slot].reshape(nbz * LS, LL)[:, :NLINES]
            # overlapping z-window adjoint in the SUBLANE dim (8-aligned
            # slices/pads; lane slicing at 72·bz offsets forces lane
            # rotations), then ONE whole-column MXU transpose
            B = LBZ * TCH
            H = LS - B
            body = jnp.concatenate(
                [gst[bz * LS : bz * LS + B] for bz in range(nbz)], axis=0
            )  # (nbz·B, 121)
            hz = jnp.zeros((B - H, NLINES), jnp.float32)
            halo_parts = []
            for bz in range(nbz):
                halo_parts.append(gst[bz * LS + B : (bz + 1) * LS])
                halo_parts.append(hz)
            halo = jnp.concatenate(halo_parts, axis=0)  # (nbz·B, 121)
            linesT = jnp.pad(
                body, ((0, ZCp - nbz * B), (0, 0))
            ) + jnp.pad(halo, ((B, ZCp - B - nbz * B), (0, 0)))  # (ZCp, 121)
            geye = jnp.eye(NLINES, dtype=jnp.float32)
            lines = jax.lax.dot_general(
                geye, linesT,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (121, ZCp)

            @pl.when(i >= 2)
            def _():
                out_dma(col - 2, slot).wait()

            lines_ref[slot, 0, :NLINES] = lines
            lines_ref[slot, 0, NLINES:] = jnp.zeros(
                (LL - NLINES, ZCp), jnp.float32
            )
            out_dma(col, slot).start()

    # retire still-in-flight outputs (see the build kernel's tail logic)
    for i in range(cb):
        col = p * cb + i
        slot = i % 2
        if i >= cb - 2:
            cond = col < ncols
        else:
            cond = (col < ncols) & (col + 2 >= ncols)

        @pl.when(cond)
        def _(col=col, slot=slot):
            out_dma(col, slot).wait()


@functools.partial(
    jax.jit, static_argnames=("packed_shape", "nb", "interpret")
)
def _fold_line_grads_pallas_jit(gtable, *, packed_shape, nb, interpret):
    X, Y, Z, C = packed_shape
    nbx, nby, nbz = nb
    CX, CY, CZ = nbx * LBX, nby * LBY, nbz * LBZ
    ZC = (CZ + 1) * TCH
    ZCp = -(-ZC // 128) * 128
    ncols = nbx * nby
    cb = min(COLS_PER_PROGRAM, ncols)
    kernel = functools.partial(_fold_kernel, nbz=nbz, ncols=ncols, cb=cb)
    cols = pl.pallas_call(
        kernel,
        grid=(-(-ncols // cb),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nbx * nby, LL, ZCp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nbz, LS, LL), jnp.float32),
            pltpu.VMEM((2, 1, LL, ZCp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nbz)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gtable)
    from .march_bwd import _overlap_add

    # columns (nbx·nby, 128, ZCp) → per-point grads via the cheap dense
    # XLA overlap-adds over x then y (row = px·LPY + py)
    g = cols[:, :NLINES, :ZC].reshape(nbx, nby, LPX, LPY, ZC)
    g = g.transpose(0, 2, 1, 3, 4)  # (nbx, LPX, nby, LPY, ZC)
    g = _overlap_add(g, 0, LBX)  # (CX+1, nby, LPY, ZC)
    g = _overlap_add(g, 1, LBY)  # (CX+1, CY+1, ZC)
    g = g.reshape(CX + 1, CY + 1, CZ + 1, TCH)
    return g[:X, :Y, :Z, :C]


def fold_line_grads_pallas(
    gtable: jax.Array, packed_shape, nb, *, interpret: bool = False
) -> jax.Array:
    """Pallas-kernel variant of ``line_table.fold_line_grads`` (adjoint of
    ``build_line_table_pallas``'s addressing)."""
    return _fold_line_grads_pallas_jit(
        gtable,
        packed_shape=tuple(int(v) for v in packed_shape),
        nb=tuple(int(v) for v in nb),
        interpret=bool(interpret),
    )
