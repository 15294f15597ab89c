"""Harmonic solver tests (≙ solveHarmonic, solve_harmonic.cpp:17-117)."""

import numpy as np

from volumeraytracer_tpu.models.harmonic import solve_harmonic, solveHarmonic


def test_laplace_1d_linear():
    """With uniform weights, the harmonic solution between two Dirichlet
    endpoints is the linear interpolant."""
    n = 33
    values = np.zeros(n, np.float32)
    values[0], values[-1] = 1.0, 3.0
    fixed = np.zeros(n, bool)
    fixed[0] = fixed[-1] = True
    out = np.asarray(
        solve_harmonic(values[None, :], None, fixed[None, :], max_iterations=20000, max_error=1e-14)
    )[0]
    want = np.linspace(1.0, 3.0, n)
    np.testing.assert_allclose(out, want, atol=5e-3)


def test_laplace_2d_mean_value():
    """Interior values converge toward the mean of the boundary."""
    n = 17
    values = np.zeros((n, n), np.float32)
    values[0, :] = 1.0
    values[-1, :] = 1.0
    values[:, 0] = 1.0
    values[:, -1] = 1.0
    fixed = np.zeros((n, n), bool)
    fixed[0, :] = fixed[-1, :] = fixed[:, 0] = fixed[:, -1] = True
    out = np.asarray(solve_harmonic(values, None, fixed, max_iterations=20000, max_error=1e-14))
    np.testing.assert_allclose(out[n // 2, n // 2], 1.0, atol=1e-3)
    # maximum principle: everything within boundary range
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_reference_signature_shim():
    """Flat-list API with bounds, axis-0-fastest indexing
    (solve_harmonic.cpp:46-48)."""
    bounds = [9, 5]
    size = bounds[0] * bounds[1]
    values = np.zeros(size)
    fixed = np.zeros(size, bool)
    # fix the x=0 and x=8 columns (axis 0 is fastest: index = x + 9*y)
    for y in range(bounds[1]):
        fixed[0 + 9 * y] = True
        fixed[8 + 9 * y] = True
        values[8 + 9 * y] = 8.0
    out = solveHarmonic(values, np.zeros(size), fixed, bounds, 20000, 1e-14)
    # solution ≈ x along each row
    for y in range(bounds[1]):
        row = [out[x + 9 * y] for x in range(9)]
        np.testing.assert_allclose(row, np.arange(9.0), atol=2e-2)


def test_derivative_divisor_weights():
    """Non-uniform derivative_divisor changes edge weights but keeps
    Dirichlet values pinned."""
    n = 9
    values = np.zeros(n, np.float32)
    values[0], values[-1] = 0.0, 1.0
    fixed = np.zeros(n, bool)
    fixed[0] = fixed[-1] = True
    dd = np.linspace(0, 3, n).astype(np.float32)
    out = np.asarray(
        solve_harmonic(values[None, :], dd[None, :], fixed[None, :], max_iterations=5000, max_error=1e-14)
    )[0]
    assert out[0] == 0.0 and out[-1] == 1.0
    assert np.all(np.diff(out) > -1e-6)  # monotone between the constraints
