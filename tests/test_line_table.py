"""Line-major brick table: addressing ground truth vs the packed field and
exact adjointness of the fold."""

import numpy as np

import jax.numpy as jnp

from volumeraytracer_tpu.kernels.line_table import (
    LBX, LBY, LBZ, LL, LPY, LPZ, LS, NLINES, TCH,
    build_line_table, fold_line_grads, line_brick_grid,
)
from volumeraytracer_tpu.kernels.march_pallas import LCH, NLO
from volumeraytracer_tpu.ops.fields import build_packed_field


def _scene(n=24):
    rng = np.random.default_rng(7)
    ior = (1.0 + 0.4 * rng.random((n, n, n))).astype(np.float32)
    return build_packed_field(jnp.asarray(ior))


def test_line_table_addresses_the_field():
    """table[b, z*TCH + c, px*LPY + py] must equal the bf16 hi/lo split of
    field[x0+px, y0+py, z0+z, c] — checked against the packed field."""
    packed = _scene()
    tl, nb = build_line_table(packed, None)
    assert nb == line_brick_grid(packed.shape)
    NB = nb[0] * nb[1] * nb[2]
    assert tl.shape == (NB, LS, LL)
    tl = np.asarray(tl)
    f = np.asarray(packed)
    X, Y, Z, _ = f.shape
    hi = f.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    lo = (f[..., :NLO] - hi[..., :NLO]).astype(jnp.bfloat16).astype(np.float32)
    rng = np.random.default_rng(3)
    for _ in range(40):
        bx = rng.integers(nb[0]); by = rng.integers(nb[1]); bz = rng.integers(nb[2])
        px = rng.integers(LBX + 1); py = rng.integers(LBY + 1); z = rng.integers(LPZ)
        gx, gy, gz = bx * LBX + px, by * LBY + py, bz * LBZ + z
        b = (bx * nb[1] + by) * nb[2] + bz
        line = px * LPY + py
        for c in range(4):
            want = hi[gx, gy, gz, c] if (gx < X and gy < Y and gz < Z) else 0.0
            np.testing.assert_equal(tl[b, z * TCH + c, line], np.float32(want))
        for c in range(NLO):
            want = lo[gx, gy, gz, c] if (gx < X and gy < Y and gz < Z) else 0.0
            np.testing.assert_equal(tl[b, z * TCH + LCH + c, line], np.float32(want))
    assert (tl[:, :, NLINES:] == 0).all()


def test_fold_is_adjoint_of_build_addressing():
    """<build(x), g> == <x, fold(g)> for the live (hi, c<4) rows — the fold
    must be the exact transpose of the table's point addressing (each point
    is replicated into up to 8 neighbouring bricks)."""
    packed = _scene(20)
    nb = line_brick_grid(packed.shape)
    NB = nb[0] * nb[1] * nb[2]
    rng = np.random.default_rng(11)
    g = np.zeros((NB, LS, LL), np.float32)
    # random grads on the live rows/lanes (c < 4 like the backward kernel)
    for z in range(LPZ):
        g[:, z * TCH : z * TCH + 4, :NLINES] = rng.standard_normal(
            (NB, 4, NLINES)
        ).astype(np.float32)
    folded = np.asarray(fold_line_grads(jnp.asarray(g), packed.shape, nb))
    assert folded.shape == packed.shape

    # inner-product test against a brute-force scatter
    X, Y, Z, C = packed.shape
    brute = np.zeros((X, Y, Z, C), np.float64)
    for bx in range(nb[0]):
        for by in range(nb[1]):
            for bz in range(nb[2]):
                b = (bx * nb[1] + by) * nb[2] + bz
                for px in range(LBX + 1):
                    gx = bx * LBX + px
                    if gx >= X:
                        continue
                    for py in range(LBY + 1):
                        gy = by * LBY + py
                        if gy >= Y:
                            continue
                        for z in range(LPZ):
                            gz = bz * LBZ + z
                            if gz >= Z:
                                continue
                            brute[gx, gy, gz] += g[
                                b, z * TCH : z * TCH + 4, px * LPY + py
                            ]
    np.testing.assert_allclose(folded, brute.astype(np.float32), rtol=1e-5, atol=1e-4)
