"""Line-major brick table — the layout consumed by the line-walking kernels.

Motivation (benchmarks/perf_notes.md): the point-grid table's build and
gradient fold cost 66 + 39 ms per 256³ train step because their relayouts
move 68-byte contiguous runs (PZ × f32) through XLA transposes, and the
kernel's one-hot gather contracts over K = PVP = 1408 lanes.

The line layout stores each brick as its (LPX·LPY = 121) (px, py)
point-COLUMNS ("lines"), each line being the (LPZ=9 z-points × TCH=8
channels) = 72 values that are CONTIGUOUS in the channels-last source field:

    table[b, z*TCH + c, px*LPY + py] = field[x0+px, y0+py, z0+z, c]

shape (NB, LS=72, LL=128) — lines on the LANE axis (121 live, padded to
128), (z, c) on the sublane axis (72 = 9×8, a multiple of the f32 8-sublane
DMA tile AND ≤ 128, so the kernel's gather matmul is a SINGLE MXU M-tile).
Line bricks are 10×10×8 cells — independent of the point-grid kernel's
8×8×16 bricks; chosen so that

  * build = dense overlap windows (runs of 72 contiguous floats) + ONE
    (72 × 121)-tile transpose per brick — no 68-byte runs (measured on chip:
    63 ms point → ~25 ms line at 256³, probe_line_table.py);
  * the kernel gather becomes  table[b] @ onehot(line_id + off)  with
    K = 128 instead of 1408 and M = 72 ≤ 128 (one M-tile instead of 11
    K-tiles), and the 8 corner ROLLS disappear: x/y corners are the +1 /
    +LPY / +LPY+1 line offsets (4 one-hot column blocks in one matmul); the
    z corner pair is selected from the gathered line by a 9-iteration
    per-window z mask (the anchor z is fixed within a window);
  * the gradient fold inverts with the same dense structure (36 ms point →
    ~20 ms line measured) and the backward kernel's flush needs no corner
    roll-fold — the accumulator IS point-grad lines.

Reference anchor: this table plays the role of the CUDA texture cache
(/root/reference/src/cuda_volume_raytracer.cu:704-718) for the VMEM-resident
march; the channel encoding (bf16 hi/lo split gradient rows) is shared with
the point table (march_pallas.py TCH layout comment).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .march_pallas import LCH, NLO, TCH, _overlap_windows

# line-brick extents (cells) and point extents (cells + 1 halo point).
# (10, 10, 8) measured best on chip (benchmarks/probe_lines_geom.py):
# a taller (10, 10, 15) brick (LS = 128, one full M-tile) was tried and is
# ~20% SLOWER forward — the MXU does NOT pad M to 128 (cost scales with
# LS), and the per-window z-select scales with LPZ, so short-z bricks win;
# lines = 11·11 = 121 of 128 lanes live, LS = 9·8 = 72 rows.
LBX, LBY, LBZ = 10, 10, 8
LPX, LPY, LPZ = LBX + 1, LBY + 1, LBZ + 1
LS = LPZ * TCH  # 72 sublanes: (z, channel) pairs, contiguous in the source
LL = 128  # lane width; 121 live lines (px*LPY + py)
NLINES = LPX * LPY  # 121
#: lane offsets of the 4 (dx, dy) corner lines relative to the anchor line
LINE_OFF = (0, 1, LPY, LPY + 1)


def line_brick_grid(packed_shape) -> Tuple[int, int, int]:
    """Line-brick-grid extents for a packed field's spatial shape."""
    cx, cy, cz = (int(s) - 1 for s in packed_shape[:3])
    return (-(-cx // LBX), -(-cy // LBY), -(-cz // LBZ))


@functools.partial(jax.jit, static_argnames=("has_absorb",))
def _build_line_table_jit(packed, absorb, *, has_absorb):
    X, Y, Z, C = packed.shape
    nbx, nby, nbz = line_brick_grid(packed.shape)
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

    t = _overlap_windows(t, 2, LBZ, LPZ)  # (CX+1, CY+1, nbz, LPZ, TCH)
    t = t.reshape(CX + 1, CY + 1, nbz, LS)  # contiguous (z, c) lines
    t = _overlap_windows(t, 1, LBY, LPY)  # (CX+1, nby, LPY, nbz, LS)
    t = _overlap_windows(t, 0, LBX, LPX)  # (nbx, LPX, nby, LPY, nbz, LS)
    t = t.transpose(0, 2, 4, 5, 1, 3)  # (nbx, nby, nbz, LS, LPX, LPY)
    t = t.reshape(nbx * nby * nbz, LS, NLINES)
    return jnp.pad(t, ((0, 0), (0, 0), (0, LL - NLINES)))


def build_line_table(
    packed: jax.Array,
    translucency: Optional[jax.Array] = None,
    *,
    absorb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[int, int, int]]:
    """(NB, LS, LL) line-major table; see module docstring.  Same channel
    encoding as ``build_brick_table`` (bf16 hi/lo split rows within each
    line's TCH stride); same translucency/absorb contract."""
    from .march_pallas import absorption_fraction

    assert packed.shape[-1] == 4
    nb = line_brick_grid(packed.shape)
    if translucency is not None:
        assert absorb is None
        absorb = absorption_fraction(translucency)
    has = absorb is not None
    if absorb is None:
        absorb = jnp.zeros((1, 1, 1), jnp.float32)
    return _build_line_table_jit(packed, absorb, has_absorb=has), nb


def fold_line_grads(gtable: jax.Array, packed_shape, nb) -> jax.Array:
    """(NB, LS, LL) line-major point-grad table → packed-field gradient
    (adjoint of ``build_line_table``'s addressing, dense overlap-add)."""
    from .march_bwd import _overlap_add

    X, Y, Z, C = packed_shape
    nbx, nby, nbz = nb
    g = gtable[:, :, :NLINES].reshape(nbx, nby, nbz, LS, LPX, LPY)
    g = g.transpose(0, 4, 1, 5, 2, 3)  # (nbx, LPX, nby, LPY, nbz, LS)
    # undo in reverse build order: x, then y, then z
    g = _overlap_add(g, 0, LBX)  # (CX+1, nby, LPY, nbz, LS)
    g = _overlap_add(g, 1, LBY)  # (CX+1, CY+1, nbz, LS)
    g = g.reshape(g.shape[0], g.shape[1], nbz, LPZ, TCH)
    g = _overlap_add(g, 2, LBZ)  # (CX+1, CY+1, CZ+1, TCH)
    return g[:X, :Y, :Z, :C]
