"""Gradcheck for the reverse-replay Pallas adjoint kernel (interpret mode on
CPU — the NCUDA-analogue backend, SURVEY.md §4) against the XLA scan-remat
differentiable march and finite differences.

The forward contract is the reference hot loop
(/root/reference/src/cuda_volume_raytracer.cu:335-349); the backward pass is
a new capability (SURVEY.md §0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volumeraytracer_tpu.kernels.march_bwd import (
    _bwd_impl,
    march_pallas_diff,
)
from volumeraytracer_tpu.kernels.march_pallas import build_brick_table, march_pallas
from volumeraytracer_tpu.ops import march as march_ops
from volumeraytracer_tpu.ops.fields import build_packed_field
from volumeraytracer_tpu.types import FIX_ONE, STEP_CONST

INV = 2.0
BEND = INV / float(FIX_ONE)
STEP = INV * (STEP_CONST / float(FIX_ONE) / float(FIX_ONE))


def _grin(n=32, amp=0.4):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.asarray(
        1.0 + amp * np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    )


def _rays(n_rays, lo=3.0, hi=26.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [
            np.full(n_rays, 1.5, np.float32),
            rng.uniform(lo, hi, n_rays).astype(np.float32),
            rng.uniform(lo, hi, n_rays).astype(np.float32),
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
    return jnp.asarray(pos), jnp.asarray(dirs), rng


def test_grads_match_xla_march():
    """d_packed / d_pos0 / d_dir0 vs jax.grad of the XLA differentiable
    march — same trajectory, independent adjoint implementations."""
    packed = build_packed_field(_grin(32))
    pos, dirs, rng = _rays(24)
    budget = 150
    wp = jnp.asarray(rng.normal(size=pos.shape).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=dirs.shape).astype(np.float32))

    def loss_pallas(packed, pos, dirs):
        r = march_pallas_diff(
            packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            k_steps=8, interpret=True,
        )
        return jnp.sum(r.end_position * wp) + jnp.sum(r.end_direction * wd)

    def loss_xla(packed, pos, dirs):
        r = march_ops.march_float(
            packed, None, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            chunk_steps=16, differentiable=True,
        )
        return jnp.sum(r.end_position * wp) + jnp.sum(r.end_direction * wd)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(packed, pos, dirs)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(packed, pos, dirs)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=1e-3 * scale, rtol=0)


def test_grads_match_finite_differences():
    """Directional finite-difference check of d_packed and d_pos0 on a short
    march (independent of both AD implementations)."""
    packed = build_packed_field(_grin(24))
    pos, dirs, rng = _rays(8, lo=3.0, hi=18.0, seed=5)
    budget = 120

    def loss(packed, pos):
        r = march_pallas_diff(
            packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            k_steps=8, interpret=True,
        )
        return jnp.sum(r.end_position)

    g_packed, g_pos = jax.grad(loss, argnums=(0, 1))(packed, pos)

    # the perturbations must clear f32 forward noise: packed values are
    # O(10^4) (log-ior gradients in reference units) so eps=4 is still a
    # ~3e-4 relative field perturbation
    v = jnp.asarray(rng.normal(size=packed.shape).astype(np.float32))
    eps = 4.0
    lp = float(loss(packed + eps * v, pos))
    lm = float(loss(packed - eps * v, pos))
    fd = (lp - lm) / (2 * eps)
    an = float(jnp.sum(g_packed * v))
    np.testing.assert_allclose(an, fd, rtol=2e-2)

    vpos = jnp.asarray(rng.normal(size=pos.shape).astype(np.float32))
    eps = 0.03
    lp = float(loss(packed, pos + eps * vpos))
    lm = float(loss(packed, pos - eps * vpos))
    fd = (lp - lm) / (2 * eps)
    an = float(jnp.sum(g_pos * vpos))
    np.testing.assert_allclose(an, fd, rtol=1e-2)


def test_reverse_reconstruction_drift_bounded():
    """The reverse replay reconstructs the start position from the end state;
    float drift over a long march must stay far below a voxel (ADVICE r1:
    bound the fl((x+t)-t) != x compounding empirically)."""
    packed = build_packed_field(_grin(40))
    pos, dirs, _ = _rays(16, lo=3.0, hi=34.0, seed=2)
    budget = 600

    res, raw = march_pallas(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, return_state=True,
    )
    table, nb = build_brick_table(packed)
    nexec = jnp.maximum(jnp.int32(budget - 1) - raw["remaining"], 0)
    _, _, _, recon, windows = _bwd_impl(
        table, nb, res.end_position, res.end_direction, nexec,
        jnp.zeros_like(pos), jnp.zeros_like(dirs),
        bend=(BEND,) * 3, step=(STEP,) * 3, k_steps=8, max_windows=None,
        interpret=True, budget=budget,
    )
    drift = np.abs(np.asarray(recon) - np.asarray(pos)).max()
    assert drift < 1e-4, drift
    # saturation flag: the adjoint replay must not have been truncated
    assert (np.asarray(windows) < 2 * budget + 64).all()


def test_absorption_forward_zero_translucency_grad():
    """With translucency, the diff path's forward outputs must match the
    plain kernel, and gradients stay finite with the absorption/termination
    treated straight-through."""
    n = 32
    ior = _grin(n, amp=0.2)
    tr = jnp.full((n, n, n), 0xFFFFFFFF - int(0xFFFFFFFF / 500), jnp.uint32)
    from volumeraytracer_tpu.ops.fields import cropped_translucency

    packed = build_packed_field(ior, tr)
    trc = cropped_translucency(tr)
    pos, dirs, rng = _rays(8, seed=7)
    budget = 300
    minb = int(0.6 * 0xFFFFFFFF)  # dark exit after ~200 steps

    ref = march_pallas(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        translucency=trc, minimum_brightness=minb, k_steps=8, interpret=True,
    )
    assert (np.asarray(ref.end_iteration) < budget).all()

    def loss(packed, pos, dirs):
        r = march_pallas_diff(
            packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            translucency=trc, minimum_brightness=minb, k_steps=8,
            interpret=True,
        )
        return jnp.sum(r.end_position), r

    (_, r), grads = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
        packed, pos, dirs
    )
    np.testing.assert_array_equal(
        np.asarray(r.end_iteration), np.asarray(ref.end_iteration)
    )
    np.testing.assert_allclose(
        np.asarray(r.end_position), np.asarray(ref.end_position), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(r.remaining_light), np.asarray(ref.remaining_light)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_scene_api_differentiable_pallas():
    """RaytraceScene.trace_rays(kernel='pallas', differentiable=True) — the
    public wiring — agrees with the XLA differentiable float path in both
    value and gradient (through the |v|=n normalisation preprocessing)."""
    from volumeraytracer_tpu import RaytraceScene

    n = 24
    ior = np.ones((n, 12, 12), np.float32)
    for i in range(n):
        ior[i] = 1.0 + i / (n - 1)
    sc = RaytraceScene(ior)
    pos = jnp.asarray(
        [[1.5, 4.0, 4.0], [1.5, 6.5, 3.5], [1.5, 8.0, 8.0]], jnp.float32
    )
    dirs = jnp.tile(jnp.asarray([[16.0, 0.0, 0.0]], jnp.float32), (3, 1))

    def loss(pos, kernel):
        r = sc.trace_rays(
            pos, dirs, invscale=[2.0] * 3, iterations=200, mode="float",
            kernel=kernel, differentiable=True,
        )
        return jnp.sum(r.end_position) + jnp.sum(r.end_direction)

    vp, gp = jax.value_and_grad(lambda p: loss(p, "pallas"))(pos)
    vx, gx = jax.value_and_grad(lambda p: loss(p, "xla"))(pos)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-3, atol=1e-5
    )


def test_truncated_adjoint_poisons_gradients():
    """A backward replay that exhausts ``max_windows`` has only partially
    propagated adjoints; the custom_vjp must fail LOUDLY (NaN-poisoned
    gradients) instead of returning silently wrong values."""
    packed = build_packed_field(_grin(24))
    pos, dirs, _ = _rays(8, lo=3.0, hi=18.0, seed=7)
    budget = 120

    def loss(packed, max_windows):
        r = march_pallas_diff(
            packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            k_steps=8, interpret=True, max_windows=max_windows,
        )
        return jnp.sum(r.end_position)

    # ample window cap: gradients are finite
    g_ok = jax.grad(lambda p: loss(p, None))(packed)
    assert np.isfinite(np.asarray(g_ok)).all()

    # force saturation: 2 windows cannot replay a 100+-step march
    g_trunc = jax.grad(lambda p: loss(p, 2))(packed)
    assert np.isnan(np.asarray(g_trunc)).all()


def test_exact_max_windows_finish_not_poisoned():
    """A replay that legitimately finishes in EXACTLY max_windows windows
    carries fully propagated adjoints — the truncation detector keys on
    residual reverse budget (sign-encoded windows_used), not the window
    count, so this must NOT be poisoned."""
    packed = build_packed_field(_grin(24))
    pos, dirs, _ = _rays(8, lo=3.0, hi=18.0, seed=3)
    budget = 120

    res, raw = march_pallas(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, return_state=True,
    )
    table, nb = build_brick_table(packed)
    nexec = jnp.maximum(jnp.int32(budget - 1) - raw["remaining"], 0)

    def run_bwd(mw):
        return _bwd_impl(
            table, nb, res.end_position, res.end_direction, nexec,
            jnp.ones_like(pos), jnp.ones_like(dirs),
            bend=(BEND,) * 3, step=(STEP,) * 3, k_steps=8, max_windows=mw,
            interpret=True, budget=budget,
        )

    _, _, _, _, windows = run_bwd(None)
    w_needed = int(np.asarray(windows).max())
    assert w_needed > 1

    # cap at exactly the needed window count: complete, not truncated
    gtable, d_pos0, d_dir0, _, windows_exact = run_bwd(w_needed)
    assert (np.asarray(windows_exact) >= 0).all()  # no residual flag
    assert np.isfinite(np.asarray(gtable)).all()
    assert np.isfinite(np.asarray(d_pos0)).all()

    # one window fewer: genuinely truncated, residual flag set
    _, _, _, _, windows_short = run_bwd(w_needed - 1)
    assert (np.asarray(windows_short) < 0).any()


def test_differentiable_trace_path():
    """VERDICT r4 item 9: trace_rays(trace_path=True, differentiable=True)
    stays on the kernel pair — the raw in-kernel snapshots thread through
    the custom_vjp and unscramble host-side; the recorded path matches the
    non-differentiable recording and gradients still flow."""
    packed = build_packed_field(_grin(24))
    pos, dirs, _ = _rays(8, lo=3.0, hi=18.0, seed=5)
    budget = 80

    ref = march_pallas_diff(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, layout="lines",
    )
    rec = march_pallas_diff(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, layout="lines", record_path=True,
    )
    assert rec.path is not None and rec.path.shape == (8, budget + 1, 3)
    np.testing.assert_allclose(
        np.asarray(rec.end_position), np.asarray(ref.end_position), atol=1e-6
    )
    # path row 0 = start, final rows = end position
    np.testing.assert_allclose(np.asarray(rec.path[:, 0]), np.asarray(pos))
    np.testing.assert_allclose(
        np.asarray(rec.path[:, -1]), np.asarray(rec.end_position), atol=1e-5
    )
    # parity with the plain (non-differentiable) in-kernel recording
    from volumeraytracer_tpu.kernels.march_lines import march_lines

    plain = march_lines(
        packed, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
        k_steps=8, interpret=True, record_path=True,
    )
    np.testing.assert_allclose(
        np.asarray(rec.path), np.asarray(plain.path), atol=1e-6
    )

    # gradients flow through the recording forward
    def loss(p):
        r = march_pallas_diff(
            p, pos, dirs, budget, bend_scale=BEND, step_scale=STEP,
            k_steps=8, interpret=True, layout="lines", record_path=True,
        )
        return jnp.sum(r.end_position)

    g = jax.grad(loss)(packed)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
