"""Pallas brick-march kernel vs the pure-jnp float march (interpret mode on
CPU — the NCUDA-analogue backend parity check, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_pallas import (
    BX, BY, BZ, PV, PVP, PX, PY, PZ, TCH,
    build_brick_table,
    march_pallas,
)
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


def test_brick_table_matches_packed():
    from volumeraytracer_tpu.ops.fields import cropped_translucency

    ior, tr = _scene(12)
    packed = build_packed_field(ior, tr)
    trc = cropped_translucency(tr)
    table, nb = build_brick_table(packed, trc)
    table = np.asarray(table)
    nbx, nby, nbz = nb
    assert table.shape == (nbx * nby * nbz, TCH, PVP)
    p = np.asarray(packed)
    cx, cy, cz = (s - 1 for s in p.shape[:-1])
    # spot-check: every corner of every valid cell is reachable as the
    # anchor point + CORNER_OFF in the owning brick's point grid
    rng = np.random.default_rng(1)
    for _ in range(50):
        x, y, z = rng.integers(0, cx), rng.integers(0, cy), rng.integers(0, cz)
        b = ((x // BX) * nby + (y // BY)) * nbz + (z // BZ)
        j = ((x % BX) * PY + (y % BY)) * PZ + (z % BZ)
        for dx_ in (0, 1):
            for dy_ in (0, 1):
                for dz_ in (0, 1):
                    jj = j + (dx_ * PY + dy_) * PZ + dz_
                    v = p[x + dx_, y + dy_, z + dz_]
                    # gradient channels are stored as a bf16 hi/lo split
                    # (rows 0-2 + 5-7); hi must be exactly the bf16
                    # rounding (so a DEFAULT-precision MXU pass is
                    # lossless) and hi + lo must reconstruct f32 to
                    # ~2^-17 relative
                    hi = table[b, :3, jj]
                    lo = table[b, 5:8, jj]
                    expect_hi = np.asarray(
                        jnp.asarray(v[:3]).astype(jnp.bfloat16).astype(jnp.float32)
                    )
                    np.testing.assert_array_equal(hi, expect_hi)
                    np.testing.assert_allclose(
                        hi + lo, v[:3], rtol=1e-5, atol=1e-5 * max(1.0, np.abs(v).max())
                    )
                    # opacity is hi-only and must be sign-exact
                    op = table[b, 3, jj]
                    assert np.sign(op) == np.sign(v[3])
                    np.testing.assert_allclose(op, v[3], rtol=8e-3, atol=1e-7)
        expect_absorb = (0xFFFFFFFF - float(np.asarray(trc)[x, y, z])) / 0xFFFFFFFF
        np.testing.assert_allclose(table[b, 4, j], expect_absorb, rtol=8e-3, atol=1e-7)
        assert (table[b, :, PV:] == 0).all()


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


def test_pallas_march_absorption_matches_jnp():
    """Absorption + minimum_brightness inside the Pallas kernel (the
    reference hot-loop feature .cu:337-341 the round-1 kernel lacked)."""
    from volumeraytracer_tpu.ops.fields import cropped_translucency

    n = 32
    ior = np.full((n, n, n), 1.2, np.float32)
    # semi-transparent medium: lose ~1/400 of full brightness per step
    tr = np.full((n, n, n), 0xFFFFFFFF - int(0xFFFFFFFF / 400), np.uint32)
    packed = build_packed_field(jnp.asarray(ior), jnp.asarray(tr))
    trc = cropped_translucency(jnp.asarray(tr))

    n_rays = 16
    rng = np.random.default_rng(3)
    pos = np.stack(
        [
            np.full(n_rays, 1.5, np.float32),
            rng.uniform(3.0, 26.0, n_rays).astype(np.float32),
            rng.uniform(3.0, 26.0, n_rays).astype(np.float32),
        ],
        axis=-1,
    )
    dirs = np.tile(np.array([[16.0, 0.5, -0.25]], np.float32), (n_rays, 1))
    inv = 2.0
    bend = inv / float(FIX_ONE)
    step = inv * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))
    budget = 500
    minb = int(0.5 * 0xFFFFFFFF)  # rays go dark after ~200 steps

    ref = march_ops.march_float(
        packed, trc, jnp.asarray(pos), jnp.asarray(dirs), budget,
        bend_scale=bend, step_scale=step, chunk_steps=64,
        minimum_brightness=minb,
    )
    res = march_pallas(
        packed, jnp.asarray(pos), jnp.asarray(dirs), budget,
        bend_scale=bend, step_scale=step, translucency=trc,
        minimum_brightness=minb, k_steps=16, interpret=True,
    )
    it_ref = np.asarray(ref.end_iteration)
    assert (it_ref < budget).all()  # the dark exit fired
    # brightness is f32 in the kernel vs uint32 in XLA: one step of slack
    np.testing.assert_allclose(
        np.asarray(res.end_iteration).astype(np.int64), it_ref, atol=1,
    )
    np.testing.assert_allclose(
        np.asarray(res.remaining_light).astype(np.float64),
        np.asarray(ref.remaining_light).astype(np.float64),
        rtol=2e-2,
    )
    # the table stores the absorption fraction bf16-rounded (hi-only row, see
    # march_pallas TCH layout): a 2^-8-relative absorption difference can
    # shift the dark exit by one step, moving the endpoint one step length
    # (~0.032 voxels here) — tolerance = one step, anchored by the atol=1
    # iteration check above
    np.testing.assert_allclose(
        np.asarray(res.end_position), np.asarray(ref.end_position),
        rtol=0, atol=5e-2,
    )


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


def test_scene_api_pallas_unsupported_falls_back():
    """An explicit kernel='pallas' request on a 2D volume warns and falls
    back to the XLA march (tests/test_dispatch.py covers the full dispatch
    contract) instead of raising."""
    import numpy as np
    from volumeraytracer_tpu import RaytraceScene

    sc2 = RaytraceScene(np.ones((8, 8), np.float32))
    res = sc2.trace_rays(
        np.full((1, 2), 2.0, np.float32), np.ones((1, 2), np.float32),
        mode="float", kernel="pallas", iterations=8,
    )
    assert res.end_position.shape == (1, 2)
