"""Line-major brick table — candidate layout for the march kernels.

Motivation (benchmarks/perf_notes.md): the point-grid table's build and
gradient fold cost 66 + 39 ms per 256³ train step because their relayouts
move 68-byte contiguous runs (PZ × f32) through XLA transposes, and the
kernel's one-hot gather contracts over K = PVP = 1408 lanes.

The line layout stores each brick as its 81 (px, py) point-COLUMNS
("lines"), each line being the (PZ=17 z-points × TCH=8 channels) = 136
values that are CONTIGUOUS in the channels-last source field:

    table[b, z*TCH + c, px*PY + py] = field[x0+px, y0+py, z0+z, c]

shape (NB, LS=136, LL=128) — lines on the LANE axis (81 live, padded to
128), (z, c) on the sublane axis (136 = 17×8, a multiple of the f32
8-sublane DMA tile).  Properties:

  * build = dense overlap windows (runs of 136 floats) + ONE
    (136 × 81)-tile transpose per brick — no 68-byte runs;
  * the kernel gather becomes  table[b] @ onehot(line_id)  with K = 128
    instead of 1408: 11× cheaper one-hot build, 5× fewer MACs, and the 8
    corner ROLLS disappear (x/y corners are +PY/+1 line shifts — separate
    one-hots; z corners are sublane offsets inside the gathered line,
    selected by a per-window z mask);
  * the gradient fold inverts with the same dense structure.

This module provides the table build + fold; the kernels adopt it behind
``march_pallas(layout="lines")`` once hardware-validated.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .march_pallas import (
    BX, BY, BZ, LCH, NLO, PX, PY, PZ, TCH, brick_grid, _overlap_windows,
)

LS = PZ * TCH  # 136 sublanes: (z, channel) pairs, contiguous in the source
LL = 128  # lane width; 81 live lines (px*PY + py)
NLINES = PX * PY  # 81


@functools.partial(jax.jit, static_argnames=("has_absorb",))
def _build_line_table_jit(packed, absorb, *, has_absorb):
    X, Y, Z, C = packed.shape
    nbx, nby, nbz = brick_grid(packed.shape)
    CX, CY, CZ = nbx * BX, nby * BY, nbz * BZ
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

    t = _overlap_windows(t, 2, BZ, PZ)  # (CX+1, CY+1, nbz, PZ, TCH)
    t = t.reshape(CX + 1, CY + 1, nbz, LS)  # contiguous (z, c) lines
    t = _overlap_windows(t, 1, BY, PY)  # (CX+1, nby, PY, nbz, LS)
    t = _overlap_windows(t, 0, BX, PX)  # (nbx, PX, nby, PY, nbz, LS)
    t = t.transpose(0, 2, 4, 5, 1, 3)  # (nbx, nby, nbz, LS, PX, PY)
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
    line's TCH stride)."""
    from .march_pallas import absorption_fraction

    assert packed.shape[-1] == 4
    nb = brick_grid(packed.shape)
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
    g = gtable[:, :, :NLINES].reshape(nbx, nby, nbz, LS, PX, PY)
    g = g.transpose(0, 4, 1, 5, 2, 3)  # (nbx, PX, nby, PY, nbz, LS)
    # undo in reverse build order: x, then y, then z
    g = _overlap_add(g, 0, BX)  # (CX+1, nby, PY, nbz, LS)
    g = _overlap_add(g, 1, BY)  # (CX+1, CY+1, nbz, LS)
    g = g.reshape(g.shape[0], g.shape[1], nbz, PZ, TCH)
    g = _overlap_add(g, 2, BZ)  # (CX+1, CY+1, CZ+1, TCH)
    return g[:X, :Y, :Z, :C]
