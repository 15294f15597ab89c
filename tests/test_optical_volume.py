"""OpticalVolume gradient test — port of the reference pytest
(/root/reference/src/test_volume_raytracer.py:8-41): linear-ramp IOR clipped
to [1, 2], two opposite rays, 1000 outer × 10 inner steps; the direction norm
must double/halve across the ramp (|v| = n invariant), rtol 1e-2."""

import numpy as np
import pytest

import jax.numpy as jnp

from volumeraytracer_tpu import OpticalVolume


@pytest.mark.parametrize("ndim", [2, 3])
def test_gradient(ndim):
    shape = [100] + [10] * (ndim - 1)
    grid = np.meshgrid(*[np.linspace(0, 1, s) for s in shape], indexing="ij")
    ior = np.clip(grid[0] * 3, 1, 2).astype(np.float32)
    translucency = np.ones(shape, np.float32)
    volume = OpticalVolume(ior, translucency, [1.0] * ndim)
    volume.update()

    positions = np.zeros((2, ndim), np.float32)
    directions = np.zeros((2, ndim), np.float32)
    positions[0] = [5] + [5] * (ndim - 1)
    positions[1] = [95] + [5] * (ndim - 1)
    directions[0] = [10] + [0] * (ndim - 1)
    directions[1] = [-10] + [0] * (ndim - 1)
    start_norm = np.linalg.norm(directions, axis=-1)

    pos = jnp.asarray(positions)
    dirs = jnp.asarray(directions)
    for _ in range(1000):
        iterations = np.full((2,), 10, np.uint32)
        pos, dirs, _ = volume.trace_rays(pos, dirs, iterations, np.asarray(shape, np.float32))

    end_norm = np.linalg.norm(np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(start_norm[0], end_norm[0] / 2, rtol=1e-2)
    np.testing.assert_allclose(start_norm[1], end_norm[1] * 2, rtol=1e-2)


def test_get_ior_point_sample():
    ior = np.arange(24, dtype=np.float32).reshape(4, 6)
    volume = OpticalVolume(ior, np.ones_like(ior), 1.0)
    got = np.asarray(volume.get_ior(np.array([[1.2, 3.9], [0.0, 0.0]])))
    np.testing.assert_array_equal(got, [ior[1, 3], ior[0, 0]])


def test_per_ray_iteration_budgets():
    """Heterogeneous per-ray budgets (≙ the CuPy kernel's per-ray uint32
    iteration counter, volume_raytracer.py:159): a ray with budget 3 executes
    exactly 3 steps while its neighbour with a huge budget runs to the wall."""
    shape = (64, 8)
    ior = np.ones(shape, np.float32)
    volume = OpticalVolume(ior, np.ones(shape, np.float32), 1.0)
    pos = np.array([[2.0, 4.0], [2.0, 4.0]], np.float32)
    dirs = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
    p, d, rem = volume.trace_rays(pos, dirs, np.array([3, 10_000], np.uint32))
    # constant field, |v|=1 ⇒ step length 1 voxel/step
    np.testing.assert_allclose(np.asarray(p)[0, 0], 5.0, atol=1e-5)
    assert float(p[1, 0]) > 60.0  # ran to the far bound
    assert int(rem[0]) == 0
    # remaining = per-ray budget − executed steps, in the ray's own units
    assert int(rem[1]) == 10_000 - int(np.asarray(p)[1, 0] - 2.0)


def test_opaque_termination():
    """Rays stop when the translucency channel goes negative
    (volume_raytracer.py:166: interp[dim] < 0 → break)."""
    shape = (32, 8)
    ior = np.ones(shape, np.float32)
    translucency = np.ones(shape, np.float32)
    translucency[20:, :] = -1.0  # opaque wall
    volume = OpticalVolume(ior, translucency, 1.0)
    pos = np.array([[2.0, 4.0]], np.float32)
    dirs = np.array([[10.0, 0.0]], np.float32)
    p, d, _ = volume.trace_rays(pos, dirs, np.full((1,), 10_000, np.uint32))
    assert float(p[0, 0]) < 21.0  # stopped at the wall, not the far bound
    assert float(p[0, 0]) > 18.0
