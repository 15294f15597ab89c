"""Pallas brick-march kernel vs the pure-jnp float march (interpret mode on
CPU — the NCUDA-analogue backend parity check, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_pallas import build_corner_table, march_pallas
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST


def _scene(n=40):
    """Lens-ish GRIN volume with an opaque wall near the far end."""
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    ior = 1.0 + 0.4 * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    translucency = np.full((n, n, n), 0xFFFFFFFF, np.uint32)
    translucency[9] = 0  # opaque plane (~7.5 voxels from the ray starts)
    return jnp.asarray(ior), jnp.asarray(translucency)


def test_corner_table_matches_packed():
    ior, tr = _scene(12)
    packed = build_packed_field(ior, tr)
    t4 = np.asarray(build_corner_table(packed))  # (Xc, Yc, Zc//4, 128)
    Xc, Yc, Zc4, L = t4.shape
    assert L == 128 and Xc % 8 == 0 and (Zc4 * 4) % 16 == 0
    table = t4.reshape(Xc, Yc, Zc4 * 4, 32)  # undo 4-cells-per-row packing
    p = np.asarray(packed)
    cx, cy, cz = (s - 1 for s in p.shape[:-1])
    # corner o = (dx*2+dy)*2+dz in product order
    o = 0
    for dx_ in (0, 1):
        for dy_ in (0, 1):
            for dz_ in (0, 1):
                np.testing.assert_array_equal(
                    table[:cx, :cy, :cz, o * 4 : o * 4 + 4],
                    p[dx_ : dx_ + cx, dy_ : dy_ + cy, dz_ : dz_ + cz],
                )
                o += 1
    # padded region is zero
    assert (table[cx:] == 0).all()


@pytest.mark.parametrize("budget", [64, 300])
def test_pallas_march_matches_jnp(budget):
    ior, tr = _scene(40)
    packed = build_packed_field(ior, tr)

    rng = np.random.default_rng(0)
    n_rays = 70  # exercises tile padding (tiles of 1024)
    pos = np.stack(
        [
            np.full(n_rays, 1.5, np.float32),
            rng.uniform(3.0, 34.0, n_rays).astype(np.float32),
            rng.uniform(3.0, 34.0, n_rays).astype(np.float32),
        ],
        axis=-1,
    )
    dirs = np.stack(
        [
            np.full(n_rays, 16.0, np.float32),
            rng.uniform(-2.0, 2.0, n_rays).astype(np.float32),
            rng.uniform(-2.0, 2.0, n_rays).astype(np.float32),
        ],
        axis=-1,
    )

    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))

    ref = march_ops.march_float(
        packed, None, jnp.asarray(pos), jnp.asarray(dirs), budget,
        bend_scale=bend, step_scale=step, chunk_steps=64,
    )
    res = march_pallas(
        packed, jnp.asarray(pos), jnp.asarray(dirs), budget,
        bend_scale=bend, step_scale=step, k_steps=8, interpret=True,
    )

    np.testing.assert_array_equal(
        np.asarray(res.end_iteration), np.asarray(ref.end_iteration)
    )
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.end_direction), np.asarray(ref.end_direction),
        rtol=1e-6, atol=1e-6,
    )
    # with the larger budget rays reach the opaque wall at x≈8.5 (~220 steps
    # at ~0.032 voxels/step): mid-flight termination parity is exercised
    if budget >= 300:
        assert (np.asarray(res.end_iteration) < budget).any()


def test_scene_api_pallas_kernel_matches_xla():
    """kernel='pallas' through the public RaytraceScene API (interpret mode
    on CPU) must agree with kernel='xla' float tracing."""
    import numpy as np
    import jax.numpy as jnp
    from volumeraytracer_tpu import RaytraceScene

    n = 24
    ior = np.ones((n, 10, 10), np.float32)
    for i in range(n):
        ior[i] = 1.0 + i / (n - 1)
    sc = RaytraceScene(ior)
    pos = np.array([[1.5, 4.0, 4.0], [1.5, 6.5, 3.5]], np.float32)
    dirs = np.tile(np.array([[16.0, 0.0, 0.0]], np.float32), (2, 1))

    a = sc.trace_rays(pos, dirs, invscale=[2.0] * 3, iterations=400, mode="float")
    b = sc.trace_rays(pos, dirs, invscale=[2.0] * 3, iterations=400,
                      mode="float", kernel="pallas")
    np.testing.assert_allclose(
        np.asarray(b.end_position), np.asarray(a.end_position), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.end_direction), np.asarray(a.end_direction), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(b.end_iteration), np.asarray(a.end_iteration)
    )


def test_scene_api_pallas_rejects_unsupported():
    import numpy as np
    import pytest
    from volumeraytracer_tpu import RaytraceScene

    sc2 = RaytraceScene(np.ones((8, 8), np.float32))
    with pytest.raises(ValueError, match="2D"):
        sc2.trace_rays(
            np.full((1, 2), 2.0, np.float32), np.ones((1, 2), np.float32),
            mode="float", kernel="pallas", iterations=8,
        )
