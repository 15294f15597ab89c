"""Line-major brick table: addressing parity with the point-grid table and
exact adjointness of the fold."""

import numpy as np

import jax.numpy as jnp

from volumeraytracer_tpu.kernels.line_table import (
    LL, LS, NLINES, build_line_table, fold_line_grads,
)
from volumeraytracer_tpu.kernels.march_bwd import GCH, fold_brickmajor_grads
from volumeraytracer_tpu.kernels.march_pallas import (
    NCH, PV, PVP, PY, PZ, TCH, brick_grid, build_brick_table,
)
from volumeraytracer_tpu.ops.fields import build_packed_field


def _scene(n=20):
    rng = np.random.default_rng(7)
    ior = (1.0 + 0.4 * rng.random((n, n, n))).astype(np.float32)
    return build_packed_field(jnp.asarray(ior))


def test_line_table_matches_point_table():
    packed = _scene()
    tp, nb = build_brick_table(packed, None)
    tl, nb2 = build_line_table(packed, None)
    assert nb == nb2
    NB = nb[0] * nb[1] * nb[2]
    assert tl.shape == (NB, LS, LL)
    tp = np.asarray(tp)
    tl = np.asarray(tl)
    # same values at corresponding addresses:
    #   point: tp[b, c, line*PZ + z]   line: tl[b, z*TCH + c, line]
    for b in (0, NB // 2, NB - 1):
        for line in (0, 1, PY, NLINES - 1):
            for z in (0, 1, PZ - 1):
                for c in range(TCH):
                    np.testing.assert_equal(
                        tl[b, z * TCH + c, line], tp[b, c, line * PZ + z]
                    )
    assert (tl[:, :, NLINES:] == 0).all()


def test_fold_line_matches_point_fold():
    packed = _scene()
    nb = brick_grid(packed.shape)
    NB = nb[0] * nb[1] * nb[2]
    rng = np.random.default_rng(11)
    gp = np.zeros((NB, GCH, PVP), np.float32)
    gp[:, :NCH, :PV] = rng.standard_normal((NB, NCH, PV)).astype(np.float32)
    # re-address the same gradients into the line layout
    gl = np.zeros((NB, LS, LL), np.float32)
    lines = np.arange(NLINES)
    for z in range(PZ):
        for c in range(NCH):
            gl[:, z * TCH + c, :NLINES] = gp[:, c, lines * PZ + z]
    fp = np.asarray(fold_brickmajor_grads(jnp.asarray(gp), packed.shape, nb))
    fl = np.asarray(fold_line_grads(jnp.asarray(gl), packed.shape, nb))
    np.testing.assert_allclose(fl, fp, rtol=1e-6, atol=1e-6)
