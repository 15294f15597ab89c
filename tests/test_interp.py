"""Interpolator unit tests — port of the reference interpolation test
(/root/reference/src/image_util_test.h:4-35) plus jnp-vs-host consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from volumeraytracer_tpu.ops.interp import (
    interp_fixed,
    interp_linear,
    interp_nearest,
    interpolate_host,
)


def test_interpolation_reference():
    """Axis gradients in a 5³ volume probed at 9 fixed-point positions: the
    interpolated value must equal pos[2-axis] * 100 / 0x10000 exactly
    (image_util_test.h:20-34, including the minor-axis-highest note)."""
    bounds = (5, 5, 5)
    pos = np.array(
        [
            [0x10000, 0x10000, 0x10000],
            [0x18000, 0x10000, 0x10000],
            [0x10000, 0x18000, 0x10000],
            [0x10000, 0x10000, 0x18000],
            [0x18000, 0x18000, 0x18000],
            [0x20000, 0x10000, 0x10000],
            [0x10000, 0x20000, 0x10000],
            [0x10000, 0x10000, 0x20000],
            [0x20000, 0x20000, 0x20000],
        ],
        np.uint32,
    )
    div = 1
    for axis in range(3):
        values = np.empty(125, np.int64)
        for i in range(125):
            values[i] = 100 * ((i // div) % 5)
        got = interpolate_host(values, bounds, pos)
        want = pos[:, 2 - axis].astype(np.int64) * 100 // 0x10000
        np.testing.assert_array_equal(got, want)
        div *= 5


def test_fixed_vs_linear_consistency():
    """interp_fixed(pos_fix) == interp_linear(pos_fix / 0x10000)."""
    rng = np.random.default_rng(0)
    field = rng.standard_normal((7, 6, 5, 4)).astype(np.float32)
    pos_vox = rng.uniform(0.0, 3.9, (32, 3)).astype(np.float64)
    pos_fix = (pos_vox * 0x10000).astype(np.uint32)
    a = np.asarray(interp_fixed(jnp.asarray(field), jnp.asarray(pos_fix)))
    b = np.asarray(
        interp_linear(jnp.asarray(field), jnp.asarray(pos_fix.astype(np.float64) / 0x10000, dtype=jnp.float32))
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_linear_matches_host():
    rng = np.random.default_rng(1)
    field = rng.standard_normal((6, 5, 4)).astype(np.float32)
    pos_vox = rng.uniform(0.0, 2.9, (16, 3))
    pos_fix = (pos_vox * 0x10000).astype(np.uint32)
    got = np.asarray(interp_linear(jnp.asarray(field), jnp.asarray(pos_fix.astype(np.float64) / 0x10000, dtype=jnp.float32)))
    want = interpolate_host(field.astype(np.float64), field.shape, pos_fix)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nearest_clamps():
    field = np.arange(12, dtype=np.float32).reshape(3, 4)
    # outside positions clamp to edge voxels (CuPy clamp addressing)
    out = np.asarray(
        interp_nearest(jnp.asarray(field), jnp.asarray([[-1.0, -2.0], [5.0, 9.0], [1.5, 2.5]]))
    )
    np.testing.assert_array_equal(out, [0.0, 11.0, field[1, 2]])
